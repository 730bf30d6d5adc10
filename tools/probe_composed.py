"""Composed-glue overhead decomposition (round-5 preview follow-up).

runs/bench_r5_preview.err measured the composed route winning packed
(252.6 MP/s b2) and on the flagship (26.9 vs 23.0 b1) but LOSING unpacked
at baseline (98.3 vs 211.9 folded b1) — a ~10-15 ms per-call overhead.
Suspects: (a) the fold/compose plan chain re-executed per call inside jit
(XLA does not hoist it out of the fori_loop), (b) the staged border
strips, (c) the composed 5x5 conv itself.  These probes time each part
with the plan precomputed EAGERLY and passed as a jit argument.

Run ON THE CHIP via tools/chiplock.sh:
    with_chip timeout 1500 python tools/probe_composed.py 2> runs/probe_composed.err
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _iter_time


def _row(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.apply import (
        _edsr_glue_composed,
        _edsr_glue_staged,
        _pack_frames,
        edsr_composed_forward,
        edsr_composed_packed_forward,
        edsr_folded_forward,
        edsr_glue_plan,
        pack_blockdiag_params,
    )
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle
    from ml_super_resolution_tpu.utils.config import ModelConfig

    budget = 1350
    t0 = time.monotonic()

    def left():
        return budget - (time.monotonic() - t0)

    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    m = build_model(ModelConfig(name="edsr", scale=4, channels=3))
    x = jnp.asarray(rng.random((2, 270, 480, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x[:1], train=False)
    params = v["params"]
    plan = edsr_glue_plan(params, 4)        # eager, once
    y64 = jnp.asarray(rng.random((1, 270, 480, 64)), jnp.bfloat16)

    def glue_composed(p, yy):
        pp_, plan_ = p
        return _edsr_glue_composed(pp_, yy, 4, bf16, plan=plan_)

    def glue_composed_nostrips(p, yy):
        pp_, (C, beta) = p
        dn = jax.lax.conv_dimension_numbers(
            yy.shape, C.shape, ("NHWC", "HWIO", "NHWC"))
        z = jax.lax.conv_general_dilated(
            yy, C.astype(bf16), (1, 1), "SAME", dimension_numbers=dn
        ) + beta.astype(bf16)
        for r in _upsample_stages(4):
            z = pixel_shuffle(z, r)
        return (z + jnp.asarray(0.5, bf16)).astype(jnp.float32)

    def glue_staged(p, yy):
        return _edsr_glue_staged(p, yy, 4, bf16)

    probes = []

    def add(label, fn, var, inp, iters=8, mp=None):
        probes.append((label, fn, var, inp, iters, mp))

    add("base-glue-composed+strips-b1", glue_composed, (params, plan), y64)
    add("base-glue-composed-nostrips-b1", glue_composed_nostrips,
        (params, plan), y64)
    add("base-glue-staged-b1", glue_staged, params, y64)

    def whole_composed(p, inp):
        pp_, plan_ = p
        return edsr_composed_forward(pp_, inp, 4, dtype=bf16, plan=plan_)

    add("base-composed-eagerplan-b1", whole_composed, (params, plan), x[:1],
        iters=6, mp=1)
    add("base-folded-b1", lambda p, inp: edsr_folded_forward(
        p, inp, 4, dtype=bf16), params, x[:1], iters=6, mp=1)

    pp = pack_blockdiag_params(params, 2, 4)
    pplan = edsr_glue_plan(pp, 4)

    def whole_packed(p, inp):
        q, plan_ = p
        return edsr_composed_packed_forward(q, inp, 4, reps=2, dtype=bf16,
                                            plan=plan_)

    add("base-composed-packed2-eagerplan-b2", whole_packed, (pp, pplan), x,
        iters=6, mp=2)

    # plan construction cost, isolated (jitted alone)
    def plan_only(p, _):
        C, beta = edsr_glue_plan(p, 4)
        return jnp.float32(jnp.sum(C) + jnp.sum(beta))

    add("plan-construction-base", plan_only, params,
        jnp.zeros((1,), jnp.float32), iters=4)

    # flagship with eager plan
    mf = build_model(ModelConfig(
        name="edsr", scale=4, channels=3,
        overrides={"num_blocks": 32, "features": 256, "res_scale": 0.1}))
    vf = mf.init(jax.random.key(0), x[:1], train=False)
    fplan = edsr_glue_plan(vf["params"], 4)

    def whole_full(p, inp):
        pr, plan_ = p
        return edsr_composed_forward(pr, inp, 4, res_scale=0.1, dtype=bf16,
                                     plan=plan_)

    add("full-composed-eagerplan-b1", whole_full, (vf["params"], fplan),
        x[:1], iters=2, mp=1)

    y256 = jnp.asarray(rng.random((1, 270, 480, 256)), jnp.bfloat16)
    add("full-glue-composed+strips-b1",
        lambda p, yy: _edsr_glue_composed(p[0], yy, 4, bf16, plan=p[1]),
        (vf["params"], fplan), y256, iters=6)

    for label, fn, var, inp, iters, mp in probes:
        if left() < 120:
            _row(f"# probe budget exhausted before {label}")
            break
        try:
            dt = _iter_time(fn, var, inp, iters=iters)
            extra = f"  {mp * 1080 * 1920 / 1e6 / dt:.1f} MP/s" if mp else ""
            _row(f"# {label}: {dt * 1e3:.2f} ms{extra}")
        except Exception as e:
            _row(f"# {label} failed: {type(e).__name__}: {e}")
    _row("# probe_composed done")


if __name__ == "__main__":
    main()
