"""Multi-host / DCN entry point (SURVEY §5.8, P3).

Within one TPU slice every collective rides ICI; scaling past a slice means
multiple *processes* (one per host) coordinated through
``jax.distributed.initialize``, with cross-slice traffic riding DCN.  The
reference has no distributed story at all (SURVEY §2a: no NCCL/MPI/Gloo);
this module is the rebuild's equivalent seam:

* ``maybe_initialize`` — no-op unless a coordinator address is given, so
  every single-host invocation (tests, the one-chip bench environment) is
  untouched.  Wired behind ``sr train --coordinator/--num-processes``.
* ``make_multihost_mesh`` — a ``(dcn, data)`` mesh with the slow axis
  outermost: devices are grouped process-major (``jax.devices()`` order), so
  an all-reduce over ``data`` stays on ICI within each host/slice and only
  the ``dcn`` axis crosses hosts.  Gradient psum over both axes then
  hierarchically reduces: ICI first, one cross-host hop per leader.

Beyond one process this environment is dryrun-only (single chip via a
relay): the code paths are unit-tested for the single-process case and the
multi-process path follows the standard JAX multi-controller contract —
each process feeds its *local* shard of the global batch
(``jax.make_array_from_process_local_data``; see Trainer.fit).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["maybe_initialize", "make_multihost_mesh"]


def maybe_initialize(
    coordinator: str = "",
    num_processes: int = 0,
    process_id: int = -1,
) -> bool:
    """Join a multi-process JAX cluster; no-op (False) when unconfigured.

    coordinator: ``host:port`` of process 0.  On TPU pods the runtime can
    infer ``num_processes``/``process_id`` from the metadata server; pass
    them explicitly anywhere else.
    """
    if not coordinator:
        return False
    kwargs: dict = {"coordinator_address": coordinator}
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def make_multihost_mesh(devices=None) -> Mesh:
    """``(dcn, data)`` mesh: processes on the outer (DCN) axis, each
    process's local devices contiguous on the inner (ICI) axis.

    Single-process: shape ``(1, n_devices)`` — semantically identical to the
    flat ``(data,)`` mesh, so the same code path serves both.
    """
    devices = list(devices if devices is not None else jax.devices())
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(f"uneven devices per process: {by_proc}")
    arr = np.asarray([by_proc[p] for p in sorted(by_proc)])
    return Mesh(arr, ("dcn", "data"))
