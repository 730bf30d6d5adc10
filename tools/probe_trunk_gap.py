"""EDSR-full trunk MFU-gap probes (VERDICT r4 weak #2 / next #1).

Round-4 record: the folded 32x256 flagship measures 23.0 MP/s at 1080p x4
with "trunk 108.7 TFLOP/s" while a bare 16-layer 256-ch conv stack on the
same (270,480) shapes measures 181.7 (runs/probe_mfu.err).  Before hunting
a 1.7x hardware gap, fix the ACCOUNTING: probe_mfu's trunk metric divides
trunk-only FLOPs by WHOLE-MODEL time, and EDSR-full x4's glue is not free —
the two ICNR stage convs are 3x3 256->1024 (0.61 TFLOP at LR + 2.45 TFLOP
at 2x resolution) plus the folded tail (0.11 TFLOP), i.e. ~24% of the
model's 13.1 TFLOP.  At a uniform 181.7 TFLOP/s the trunk-only metric could
never exceed ~137.  These probes therefore time the trunk and the glue
SEPARATELY, then ladder the trunk's constructs (residual add, res_scale,
long skip, unroll vs lax.scan) against the bare-stack ceiling to isolate
whatever real gap remains.

Also here (VERDICT r4 weak #3: the b>=2 glue regression): the same
trunk/glue decomposition for EDSR-baseline at b1 vs packed-b2, to locate
the ~10 ms that appears between b1 (211.9 MP/s) and packed b2 (183.5).

Run ON THE CHIP via tools/chiplock.sh:
    with_chip timeout 2400 python tools/probe_trunk_gap.py 2> runs/probe_trunk_gap.err
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _iter_time  # loop-fused, latency-cancelled timing


def _row(msg):
    print(msg, file=sys.stderr, flush=True)


def _conv_flops(h, w, k, cin, cout, n=1):
    return 2 * n * h * w * k * k * cin * cout


def edsr_setup(nb, blocks, feats):
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    ov = {"num_blocks": blocks, "features": feats}
    rs = 1.0
    if feats > 64:
        ov["res_scale"] = rs = 0.1
    m = build_model(ModelConfig(name="edsr", scale=4, channels=3, overrides=ov))
    x = jnp.asarray(np.random.default_rng(0).random((nb, 270, 480, 3)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x[:1], train=False)
    return m, v["params"], x, rs


def _conv(y, p, dtype, w=None):
    import jax

    w = p["kernel"] if w is None else w
    dn = jax.lax.conv_dimension_numbers(
        y.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, w.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    ) + p["bias"].astype(dtype)


def trunk_flops(blocks, feats, n=1, h=270, w=480):
    return (_conv_flops(h, w, 3, 3, feats, n)
            + _conv_flops(h, w, 3, feats, feats, n) * (2 * blocks + 1))


def glue_flops(feats, n=1, h=270, w=480):
    # x4 = two r=2 ICNR stages + the folded 3x3 tail (kp=5 -> k2=3,
    # cin feats*4, cout 12) at 2x resolution (kernels/apply.py).
    return (_conv_flops(h, w, 3, feats, 4 * feats, n)
            + _conv_flops(2 * h, 2 * w, 3, feats, 4 * feats, n)
            + _conv_flops(2 * h, 2 * w, 3, 4 * feats, 12, n))


def make_trunk_fn(res_scale, dtype):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=())
    def fn(params, x):
        x = x.astype(dtype) - jnp.asarray(0.5, dtype)
        head = _conv(x, params["Conv_0"], dtype)
        y = head
        nblocks = sum(1 for k in params if k.startswith("_EDSRBlock_"))
        for i in range(nblocks):
            bp = params[f"_EDSRBlock_{i}"]
            z = _conv(jnp.maximum(_conv(y, bp["Conv_0"], dtype), 0),
                      bp["Conv_1"], dtype)
            if res_scale != 1.0:
                z = z * jnp.asarray(res_scale, z.dtype)
            y = y + z
        return _conv(y, params["Conv_1"], dtype) + head

    return fn


def make_glue_fn(scale, dtype):
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.apply import fold_tail_weights
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    @partial(jax.jit, static_argnames=())
    def fn(params, y):
        y = y.astype(dtype)
        stages = _upsample_stages(scale)
        for j, r in enumerate(stages[:-1]):
            y = pixel_shuffle(
                _conv(y, params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"], dtype), r)
        r = stages[-1]
        z = _conv(y, params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"],
                  dtype)
        tail = params["Conv_2"]
        wf = fold_tail_weights(tail["kernel"], r)
        dn = jax.lax.conv_dimension_numbers(
            z.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            z, wf.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
        ) + jnp.tile(tail["bias"], r * r).astype(dtype)
        return (pixel_shuffle(out, r) + jnp.asarray(0.5, dtype)).astype(jnp.float32)

    return fn


def fold_res_scale(params, rs):
    """Fold the res_scale constant into every block's second conv: w,b *= rs
    in f32 — removes 32 elementwise multiplies; same math up to one bf16
    weight rounding (golden: tests/test_trunk_variants.py)."""
    import jax.numpy as jnp

    out = dict(params)
    for k in params:
        if k.startswith("_EDSRBlock_"):
            bp = dict(params[k])
            c1 = dict(bp["Conv_1"])
            c1["kernel"] = jnp.asarray(c1["kernel"]) * rs
            c1["bias"] = jnp.asarray(c1["bias"]) * rs
            bp["Conv_1"] = c1
            out[k] = bp
    return out


def stack_blocks(params):
    import jax.numpy as jnp

    nblocks = sum(1 for k in params if k.startswith("_EDSRBlock_"))
    stacked = {
        kk: {
            p: jnp.stack([jnp.asarray(params[f"_EDSRBlock_{i}"][kk][p])
                          for i in range(nblocks)])
            for p in ("kernel", "bias")
        }
        for kk in ("Conv_0", "Conv_1")
    }
    return stacked, nblocks


def make_scan_trunk_fn(res_scale, dtype):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=())
    def fn(ops, x):
        params, stacked = ops
        x = x.astype(dtype) - jnp.asarray(0.5, dtype)
        head = _conv(x, params["Conv_0"], dtype)

        def body(y, bp):
            z = _conv(jnp.maximum(_conv(y, bp["Conv_0"], dtype), 0),
                      bp["Conv_1"], dtype)
            if res_scale != 1.0:
                z = z * jnp.asarray(res_scale, z.dtype)
            return y + z, None

        y, _ = jax.lax.scan(body, head, stacked)
        return _conv(y, params["Conv_1"], dtype) + head

    return fn


def probe(label, fn, variables, x, flops, iters=6):
    dt = _iter_time(fn, variables, x, iters=iters)
    _row(f"# {label}: {dt * 1e3:.2f} ms  {flops / dt / 1e12:.1f} TFLOP/s")
    return dt


def mps_probe(label, fn, variables, x, n_frames, flops, iters=4):
    dt = _iter_time(fn, variables, x, iters=iters)
    mp = n_frames * 1080 * 1920 / 1e6
    _row(f"# {label}: {mp / dt:.1f} MP/s ({dt * 1e3:.2f} ms)  "
         f"model {flops / dt / 1e12:.1f} TFLOP/s")
    return dt


def ladder_probe(label, batch, ch, layers, iters, mode):
    """Bare conv-stack ladder: mode in {plain, resadd, resscale, longskip}."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ws = [jnp.asarray((rng.standard_normal((3, 3, ch, ch)) * 0.02)
                      .astype(np.float32), jnp.bfloat16)
          for _ in range(layers)]
    x = jnp.asarray(rng.random((batch, 270, 480, ch)), jnp.bfloat16)

    def conv(y, k):
        dn = jax.lax.conv_dimension_numbers(
            y.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=dn)

    def fwd(weights, inp):
        y = inp
        if mode == "plain":
            for k in weights:
                y = jnp.maximum(conv(y, k), 0)
            return y
        head = y
        for i in range(0, layers - layers % 2, 2):
            z = conv(jnp.maximum(conv(y, weights[i]), 0), weights[i + 1])
            if mode in ("resscale", "longskip"):
                z = z * jnp.asarray(0.1, z.dtype)
            y = y + z
        if mode == "longskip":
            y = y + head
        return y

    flops = _conv_flops(270, 480, 3, ch, ch, batch) * (layers - layers % 2)
    return probe(label, fwd, ws, x, flops, iters=iters)


def main():
    import jax.numpy as jnp

    budget = 2100
    t0 = time.monotonic()

    def left():
        return budget - (time.monotonic() - t0)

    bf16 = jnp.bfloat16

    state = {}

    def setup_full():
        if "full" not in state:
            state["full"] = edsr_setup(1, 32, 256)
        return state["full"]

    def p_trunk_full():
        _, params, x, rs = setup_full()
        probe("full-trunk-only-b1", make_trunk_fn(rs, bf16), params, x,
              trunk_flops(32, 256), iters=4)

    def p_glue_full():
        import jax

        _, params, _, _ = setup_full()
        z = jnp.asarray(np.random.default_rng(1).random((1, 270, 480, 256)),
                        jnp.bfloat16)
        probe("full-glue-only-b1", make_glue_fn(4, bf16), params, z,
              glue_flops(256), iters=6)

    def p_whole_full():
        from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward

        _, params, x, rs = setup_full()
        fn = lambda v, inp: edsr_folded_forward(v, inp, 4, res_scale=rs,
                                                dtype=bf16)
        mps_probe("full-whole-b1", fn, params, x, 1,
                  trunk_flops(32, 256) + glue_flops(256), iters=3)

    def p_whole_full_rsfold():
        from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward

        _, params, x, rs = setup_full()
        pf = fold_res_scale(params, rs)
        fn = lambda v, inp: edsr_folded_forward(v, inp, 4, res_scale=1.0,
                                                dtype=bf16)
        mps_probe("full-whole-b1-rsfolded", fn, pf, x, 1,
                  trunk_flops(32, 256) + glue_flops(256), iters=3)

    def p_trunk_full_rsfold():
        _, params, x, rs = setup_full()
        pf = fold_res_scale(params, rs)
        probe("full-trunk-only-b1-rsfolded", make_trunk_fn(1.0, bf16), pf, x,
              trunk_flops(32, 256), iters=4)

    def p_trunk_full_scan():
        _, params, x, rs = setup_full()
        stacked, _ = stack_blocks(params)
        probe("full-trunk-only-b1-scan", make_scan_trunk_fn(rs, bf16),
              (params, stacked), x, trunk_flops(32, 256), iters=4)

    # ---- construct ladder on bare 256-ch stacks (16 layers = 8 blocks) ----
    def p_ladder_plain():
        ladder_probe("ladder256-plain16", 1, 256, 16, 4, "plain")

    def p_ladder_resadd():
        ladder_probe("ladder256-resadd8", 1, 256, 16, 4, "resadd")

    def p_ladder_resscale():
        ladder_probe("ladder256-resscale8", 1, 256, 16, 4, "resscale")

    def p_ladder_longskip():
        ladder_probe("ladder256-longskip8", 1, 256, 16, 4, "longskip")

    # ---- EDSR-baseline b1 vs packed-b2 trunk/glue decomposition ----
    def setup_base():
        if "base" not in state:
            state["base"] = edsr_setup(2, 16, 64)
        return state["base"]

    def p_base_trunk_b1():
        _, params, x, rs = setup_base()
        probe("base-trunk-only-b1", make_trunk_fn(rs, bf16), params, x[:1],
              trunk_flops(16, 64), iters=8)

    def p_base_glue_b1():
        _, params, _, _ = setup_base()
        z = jnp.asarray(np.random.default_rng(1).random((1, 270, 480, 64)),
                        jnp.bfloat16)
        probe("base-glue-only-b1", make_glue_fn(4, bf16), params, z,
              glue_flops(64), iters=8)

    def p_base_trunk_packed2():
        from ml_super_resolution_tpu.kernels.apply import (
            _pack_frames, pack_blockdiag_params)

        _, params, x, rs = setup_base()
        pp = pack_blockdiag_params(params, 2, 4)
        xp = _pack_frames(x, 2)
        # issued MACs are 2x useful under block-diag; report USEFUL flops
        probe("base-trunk-only-packed2 (2 frames)", make_trunk_fn(rs, bf16),
              pp, xp, trunk_flops(16, 64, n=2), iters=8)

    def p_base_glue_packed2():
        from ml_super_resolution_tpu.kernels.apply import (
            _pack_frames, pack_blockdiag_params)

        _, params, _, _ = setup_base()
        pp = pack_blockdiag_params(params, 2, 4)
        z = jnp.asarray(np.random.default_rng(1).random((2, 270, 480, 64)),
                        jnp.bfloat16)
        zp = _pack_frames(z, 2)
        probe("base-glue-only-packed2 (2 frames)", make_glue_fn(4, bf16),
              pp, zp, glue_flops(64, n=2), iters=8)

    def p_base_glue_b2():
        _, params, _, _ = setup_base()
        z = jnp.asarray(np.random.default_rng(1).random((2, 270, 480, 64)),
                        jnp.bfloat16)
        probe("base-glue-only-b2 (2 frames)", make_glue_fn(4, bf16), params, z,
              glue_flops(64, n=2), iters=8)

    probes = [
        ("full-trunk", p_trunk_full),
        ("full-glue", p_glue_full),
        ("full-whole", p_whole_full),
        ("full-whole-rsfold", p_whole_full_rsfold),
        ("base-trunk-b1", p_base_trunk_b1),
        ("base-glue-b1", p_base_glue_b1),
        ("base-trunk-packed2", p_base_trunk_packed2),
        ("base-glue-packed2", p_base_glue_packed2),
        ("base-glue-b2", p_base_glue_b2),
        ("ladder-plain", p_ladder_plain),
        ("ladder-resadd", p_ladder_resadd),
        ("ladder-resscale", p_ladder_resscale),
        ("full-trunk-rsfold", p_trunk_full_rsfold),
        ("full-trunk-scan", p_trunk_full_scan),
        ("ladder-longskip", p_ladder_longskip),
    ]
    for name, fn in probes:
        if left() < 150:
            _row(f"# probe budget exhausted before {name}")
            break
        try:
            fn()
        except Exception as e:
            _row(f"# {name} failed: {type(e).__name__}: {e}")
    _row("# probe_trunk_gap done")


if __name__ == "__main__":
    main()
