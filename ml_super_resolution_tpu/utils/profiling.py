"""Tracing / profiling hooks (SURVEY §5.1).

The reference had nothing beyond TensorBoard wall-clock; the TPU rebuild
exposes the jax profiler (xplane traces viewable in TensorBoard/XProf) plus
a latency-robust timing helper that works through remote device attach
paths where ``block_until_ready`` cannot be trusted (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax

__all__ = ["trace", "named_scope", "device_timer"]


@contextlib.contextmanager
def trace(log_dir: str | Path, with_host: bool = True):
    """Capture a jax profiler trace (xplane) under ``log_dir``.

    View with TensorBoard's profile plugin:  tensorboard --logdir <dir>.
    """
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir), create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # re-export: annotate model blocks for XProf


def device_timer(fn, *args, iters: int = 10):
    """Latency-cancelled seconds/iteration for jitted ``fn(*args)``.

    Wraps N executions in one program via repeated dependency-free dispatch
    and scalar fencing; see bench.py::_iter_time for the loop-fused variant
    used for headline numbers.
    """
    import jax.numpy as jnp

    @jax.jit
    def loop(n_iters, *a):
        def body(i, acc):
            # i-dependent perturbation below numerical significance: without
            # it XLA hoists the loop-invariant fn call out of the loop and
            # the timer reports near-zero (same trick as bench.py::_iter_time).
            a0 = a[0] + (i * 1e-30).astype(a[0].dtype) if a else a
            out = fn(a0, *a[1:]) if a else fn()
            return acc + jnp.sum(jnp.ravel(out)[:1]).astype(jnp.float32)

        return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

    float(loop(1, *args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(iters, *args))
    t1 = time.perf_counter()
    t0b = time.perf_counter()
    float(loop(2 * iters, *args))
    t1b = time.perf_counter()
    return ((t1b - t0b) - (t1 - t0)) / iters
