"""Chip-window probes: measured facts needed for kernel design decisions.

Run ONLY when no other TPU process is active (one chip claim at a time):

    PYTHONPATH=/root/repo:/root/.axon_site timeout 560 python tools/chip_probes.py [section ...]

Sections (default: all):
  vmem     - max Pallas scratch the Mosaic compiler accepts (AOT, no exec)
  mosaic   - bf16 lane-roll + 16-aligned bf16 slice->matmul support (AOT)
  fused2   - espcn_fused2 on-device parity vs flax + both operand modes
  kapply   - K1/K2-routed vdsr/srresnet forwards on-device parity
  xlabf16  - vdsr/srresnet bf16-XLA timings (the bars fused kernels must beat)

Every probe is wrapped so one failure never blocks the rest; a kernel FAULT
can wedge the chip ~10-15 min (poll with a tiny jnp.sum under timeout 50
before the next run).
"""

from __future__ import annotations

import functools
import sys
import time
import traceback

import numpy as np


def section(name):
    def deco(fn):
        @functools.wraps(fn)
        def run():
            print(f"\n=== {name} ===", flush=True)
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as e:
                print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
                traceback.print_exc()
            print(f"[{name}] {time.perf_counter() - t0:.1f}s", flush=True)

        run._section = name
        return run

    return deco


@section("vmem")
def probe_vmem():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(mb):
        rows = mb * 1024 * 1024 // (2048 * 4)

        def kernel(x_ref, o_ref, scratch):
            scratch[0:8, :] = x_ref[:]
            o_ref[:] = scratch[0:8, :]

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
                scratch_shapes=[pltpu.VMEM((rows, 2048), jnp.float32)],
            )(x)

        x = jnp.zeros((8, 2048), jnp.float32)
        f.lower(x).compile()  # AOT: no execution
        return True

    ok = 0
    for mb in (8, 16, 24, 32, 48, 64, 96, 120, 128):
        try:
            make(mb)
            ok = mb
            print(f"  scratch {mb} MB: compile OK", flush=True)
        except Exception as e:
            print(f"  scratch {mb} MB: REJECTED ({str(e).splitlines()[0][:120]})",
                  flush=True)
            break
    print(f"  => max accepted scratch ~{ok} MB")


@section("mosaic")
def probe_mosaic():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_compile(label, kernel, scratch_shapes):
        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
                scratch_shapes=scratch_shapes,
            )(x)

        x = jnp.zeros((8, 256), jnp.float32)
        try:
            f.lower(x).compile()
            print(f"  {label}: OK", flush=True)
        except Exception as e:
            print(f"  {label}: NO ({str(e).splitlines()[0][:140]})", flush=True)

    def k_bf16_roll(x_ref, o_ref, sb):
        v = pltpu.roll(sb[:, :], 255, axis=1)  # lane roll of bf16
        o_ref[:] = v[0:8, :].astype(jnp.float32)

    try_compile("bf16 lane roll", k_bf16_roll,
                [pltpu.VMEM((32, 256), jnp.bfloat16)])

    def k_bf16_slice_mm(x_ref, o_ref, sb, w):
        sl = sb[16:80, :]  # 16-aligned bf16 slice
        o_ref[:] = jnp.dot(w[0:8, :], sl, preferred_element_type=jnp.float32)

    try_compile("bf16 16-aligned slice -> matmul", k_bf16_slice_mm,
                [pltpu.VMEM((96, 256), jnp.bfloat16),
                 pltpu.VMEM((8, 64), jnp.bfloat16)])

    def k_f32_slice_concat(x_ref, o_ref, sf):
        a = sf[8:24, :]
        b = sf[32:48, :]
        cat = jnp.concatenate([a, b], axis=0)  # 8-aligned slice concat
        o_ref[:] = cat[0:8, :]

    try_compile("f32 8-aligned slice concat", k_f32_slice_concat,
                [pltpu.VMEM((64, 256), jnp.float32)])


@section("fused2")
def probe_fused2():
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.attic.espcn_fused2 import (
        espcn_fused2_forward,
        extract_espcn_weights,
    )
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    m = build_model(ModelConfig(name="espcn", scale=4, channels=1))
    x = jnp.asarray(np.random.default_rng(0).random((2, 40, 56, 1)), jnp.float32)
    v = m.init(jax.random.key(0), x[:1], train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    wts = extract_espcn_weights(v["params"])
    for bf16 in (False, True):
        out = np.asarray(espcn_fused2_forward(wts, x, 4, bf16=bf16))
        err = float(np.abs(out - ref).max())
        print(f"  fused2 bf16={bf16}: on-device max err {err:.2e}", flush=True)


@section("kapply")
def probe_kapply():
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.apply import (
        srresnet_pallas_forward,
        vdsr_pallas_forward,
    )
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    m = build_model(ModelConfig(name="vdsr", scale=2, channels=1,
                                overrides={"depth": 6}))
    x = jnp.asarray(np.random.default_rng(0).random((1, 40, 48, 1)), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    out = np.asarray(vdsr_pallas_forward(v["params"], x))
    print(f"  vdsr K2 head: on-device max err {np.abs(out-ref).max():.2e}",
          flush=True)

    m2 = build_model(ModelConfig(name="srresnet", scale=4, channels=3,
                                 overrides={"num_blocks": 2}))
    x2 = jnp.asarray(np.random.default_rng(1).random((1, 24, 24, 3)), jnp.float32)
    v2 = m2.init(jax.random.key(1), x2, train=False)
    ref2 = np.asarray(m2.apply(v2, x2, train=False))
    out2 = np.asarray(srresnet_pallas_forward(
        v2["params"], v2.get("batch_stats", {}), x2, 4))
    print(f"  srresnet K1 stages: on-device max err {np.abs(out2-ref2).max():.2e}",
          flush=True)


@section("xlabf16")
def probe_xla_bf16():
    import jax.numpy as jnp

    import bench

    for label, kw in [
        ("vdsr-f32", dict(name="vdsr", scale=4, out_hw=(1080, 1920), batch=1,
                          channels=1)),
        ("vdsr-bf16", dict(name="vdsr", scale=4, out_hw=(1080, 1920), batch=1,
                           channels=1, overrides={"dtype": jnp.bfloat16})),
        ("srresnet-bf16", dict(name="srresnet", scale=4, out_hw=(1080, 1920),
                               batch=1, channels=3,
                               overrides={"dtype": jnp.bfloat16})),
        ("vdsr-bf16-b4", dict(name="vdsr", scale=4, out_hw=(1080, 1920), batch=4,
                              channels=1, overrides={"dtype": jnp.bfloat16})),
        ("espcn-bf16", dict(name="espcn", scale=4, out_hw=(1080, 1920), batch=8,
                            channels=1, overrides={"dtype": jnp.bfloat16})),
    ]:
        ov = kw.pop("overrides", None)
        mps, dt = bench.bench_model_mps(
            kw["name"], kw["scale"], kw["out_hw"], kw["batch"], kw["channels"],
            overrides=ov, iters=8,
        )
        print(f"  {label}: {mps:.1f} MP/s ({dt*1e3:.2f} ms)", flush=True)


@section("vdsrfused")
def probe_vdsr_fused():
    """Fused VDSR + fused ESPCN v2: AOT gate -> on-device parity -> timing.

    Self-gating: the 1080p program is AOT-compiled first (chipless, safe);
    execution only happens if Mosaic accepts it, so a rejected kernel can
    never fault the chip.  Runs inside master2's bounded probe slot.
    """
    import time as _t

    import jax
    import jax.numpy as jnp

    import bench
    from ml_super_resolution_tpu.kernels.vdsr_fused import vdsr_fused_forward
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    import sys as _sys

    m = build_model(ModelConfig(name="vdsr", scale=4, channels=1))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 1080, 1920, 1)), jnp.float32
    )
    v = m.init(jax.random.key(0), x[:1], train=False)
    ref = None

    # configs: round-3 width-chunked tiles (the 4x-waste killer) first, the
    # round-2 full-width tb=8 as the known-good fallback
    configs = [dict(tile_h=32, wc=1024, compact=True),
               dict(tile_h=32, wc=1024),
               dict(tile_h=16, wc=1024, compact=True),
               dict(tile_h=8, wc=None)]
    if len(_sys.argv) > 2:
        # `vdsrfused 32,1024,1[,g,seg] [48,1024,1,4,5 ...]` = tb,wc,compact
        configs = []
        for spec_s in _sys.argv[2:]:
            parts = spec_s.split(",")
            kw = dict(tile_h=int(parts[0]), wc=(int(parts[1]) or None),
                      compact=parts[2] == "1")
            if len(parts) > 3:
                kw["group"] = int(parts[3])
            if len(parts) > 4:
                kw["max_seg"] = int(parts[4])
            configs.append(kw)

    for kw in configs:
        label = (f"tb{kw['tile_h']}-wc{kw.get('wc')}"
                 f"-g{kw.get('group', 2)}-s{kw.get('max_seg', 4)}" + (
                     "-compact" if kw.get("compact") else ""))
        fused = jax.jit(lambda p, inp, _kw=kw: vdsr_fused_forward(
            p, inp, interpret=False, **_kw))
        t0 = _t.perf_counter()
        try:
            fused.lower(v["params"], x).compile()
        except Exception as e:
            print(f"  {label}: AOT REJECTED "
                  f"({str(e).splitlines()[0][:150]})", flush=True)
            continue
        print(f"  {label}: AOT compile {_t.perf_counter()-t0:.1f}s OK",
              flush=True)
        # parity computed ON-DEVICE: scalar readback only (a 1080p f32
        # readback through the relay costs minutes at ~30 MB/s)
        err_fn = jax.jit(lambda p, inp, _kw=kw: jnp.max(jnp.abs(
            vdsr_fused_forward(p, inp, interpret=False, **_kw)
            - m.apply({"params": p}, inp, train=False))))
        err = float(err_fn(v["params"], x))
        print(f"  {label}: on-device max err vs flax f32: {err:.2e}",
              flush=True)
        if err > 0.1:
            print(f"  {label}: PARITY FAIL — skipping timing", flush=True)
            continue
        dt = bench._iter_time(
            lambda p, inp, _kw=kw: vdsr_fused_forward(
                p, inp, interpret=False, **_kw),
            v["params"], x, iters=4,
        )
        print(f"  {label}: {1080*1920/1e6/dt:.1f} MP/s ({dt*1e3:.2f} ms)",
              flush=True)
    if len(_sys.argv) > 2:  # explicit sweep: skip the known XLA baselines
        return
    for label, ov in [("vdsr-bf16-xla", {"dtype": jnp.bfloat16}),
                      ("vdsr-f32-xla", None)]:
        mps, dtx = bench.bench_model_mps(
            "vdsr", 4, (1080, 1920), 1, 1, overrides=ov, iters=6)
        print(f"  {label}: {mps:.1f} MP/s ({dtx*1e3:.2f} ms)", flush=True)

    # (the fused ESPCN v2 tail section was removed with the kernel's
    # retirement to kernels/attic — XLA-bf16 won the ESPCN flagship)


@section("k2aot")
def probe_k2_aot():
    """AOT-compile (chipless, safe) the K2 fused-head program at 1080p.

    Round-2 regression: _pick_tile chose tile_h=32 whose 17 MB input slab
    exceeded the 16 MB scoped-VMEM cap, breaking the default --pallas VDSR
    route at the flagship frame size.  Verifies the budget-aware pick (and
    the th=16 fallback) both compile at (1, 1080, 1920, 64)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.residual import (
        _pick_tile,
        conv_residual_add,
    )

    w = jnp.zeros((3, 3, 64, 1), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    for label, (hh, ww) in [("1080p", (1080, 1920)), ("540p", (540, 960)),
                            ("4K", (2160, 3840))]:
        feats = jnp.zeros((1, hh, ww, 64), jnp.float32)
        skip = jnp.zeros((1, hh, ww, 1), jnp.float32)
        wp = -(-(ww + 2) // 128) * 128
        picked = _pick_tile(hh, 64, 1, wp)
        f = jax.jit(lambda fe, sk, we, bi, _th=picked: conv_residual_add(
            fe, sk, we, bi, tile_h=_th, interpret=False))
        t0 = _t.perf_counter()
        try:
            f.lower(feats, skip, w, b).compile()
            print(f"  K2 {label} tile_h={picked}: AOT compile OK "
                  f"({_t.perf_counter()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"  K2 {label} tile_h={picked}: REJECTED "
                  f"({str(e).splitlines()[0][:140]})", flush=True)


@section("srresprof")
def probe_srresnet_profile():
    """Where do SRResNet's ~49 ms/frame go?  Component-sliced timings.

    VERDICT r2 weak #4: 42 MP/s bf16 at batch=1 is ~3-4% MFU with no
    breakdown.  Times the full net at batch 1/4/8 plus isolated pieces:
    trunk (head+16 blocks+skip), upsample stages, 9x9 tail at 1080p, and
    the pre-shuffle tail reformulation (5x5, 256->12ch at 540p) that
    trades the N=3-lane-starved HR matmul for an N=12 LR one.
    """
    import jax
    import jax.numpy as jnp

    import bench

    def t(label, fn, params, x, iters=8, mp=None):
        try:
            dt = bench._iter_time(fn, params, x, iters=iters)
            extra = f", {mp/dt:.1f} MP/s" if mp else ""
            print(f"  {label}: {dt*1e3:.2f} ms{extra}", flush=True)
            return dt
        except Exception as e:
            print(f"  {label}: FAILED ({str(e).splitlines()[0][:120]})",
                  flush=True)
            return None

    # full net, batch scaling
    for nb in (1, 4, 8):
        try:
            mps, dt = bench.bench_model_mps(
                "srresnet", 4, (1080, 1920), nb, 3,
                overrides={"dtype": jnp.bfloat16}, iters=6)
            print(f"  full-bf16 b{nb}: {mps:.1f} MP/s ({dt*1e3:.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"  full-bf16 b{nb}: FAILED ({e})", flush=True)

    # folded-tail inference (kernels/apply.py): parity once, then timing
    try:
        from ml_super_resolution_tpu.kernels.apply import (
            srresnet_folded_forward,
        )
        from ml_super_resolution_tpu.models import build_model as _bm
        from ml_super_resolution_tpu.utils.config import ModelConfig as _MC

        m = _bm(_MC(name="srresnet", scale=4, channels=3))
        import numpy as _np

        xs = jnp.asarray(_np.random.default_rng(0).random((1, 68, 120, 3)),
                         jnp.float32)
        v = m.init(jax.random.key(0), xs, train=False)
        err = jax.jit(lambda v_, i: jnp.max(jnp.abs(
            srresnet_folded_forward(
                v_["params"], v_.get("batch_stats", {}), i, 4)
            - m.apply(v_, i, train=False))))(v, xs)
        print(f"  folded-tail on-device max err: {float(err):.2e}",
              flush=True)
        for nb in (1, 4):
            x = jnp.asarray(
                _np.random.default_rng(0).random((nb, 270, 480, 3)),
                jnp.float32)

            def fwd(var, inp):
                return srresnet_folded_forward(
                    var["params"], var.get("batch_stats", {}), inp, 4,
                    dtype=jnp.bfloat16)

            dt = bench._iter_time(fwd, v, x, iters=5)
            mp = nb * 1080 * 1920 / 1e6
            print(f"  folded-bf16 b{nb}: {mp/dt:.1f} MP/s ({dt*1e3:.2f} ms)",
                  flush=True)
    except Exception as e:
        print(f"  folded-tail: FAILED ({str(e)[:140]})", flush=True)

    # isolated pieces (random weights; timing only)
    rng = jax.random.key(0)
    bf = jnp.bfloat16
    h, w = 270, 480

    def conv(x, wgt):
        return jax.lax.conv_general_dilated(
            x, wgt, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, wgt.shape, ("NHWC", "HWIO", "NHWC")))

    k33 = jax.random.normal(rng, (3, 3, 64, 64), bf) * 0.05
    x64 = jax.random.normal(rng, (1, h, w, 64), bf)

    def trunk(wgt, x):
        def body(i, y):
            return y + conv(y, wgt)  # stand-in for a res block conv pair
        return jax.lax.fori_loop(0, 32, body, x)

    t("32x conv3x3 64->64 @270x480 bf16", trunk, k33, x64)

    k_up1 = jax.random.normal(rng, (3, 3, 64, 256), bf) * 0.05
    t("conv3x3 64->256 @270x480 bf16", lambda wg, x: conv(x, wg), k_up1, x64)
    x540 = jax.random.normal(rng, (1, 540, 960, 64), bf)
    t("conv3x3 64->256 @540x960 bf16", lambda wg, x: conv(x, wg), k_up1, x540)

    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle
    k_ps = jax.random.normal(rng, (3, 3, 64, 256), bf) * 0.05

    def upstage(wg, x):
        return pixel_shuffle(conv(x, wg), 2)

    t("upstage(conv+PS) @270x480 bf16", upstage, k_ps, x64)
    t("upstage(conv+PS) @540x960 bf16", upstage, k_ps, x540)

    x1080 = jax.random.normal(rng, (1, 1080, 1920, 64), bf)
    k_tail = jax.random.normal(rng, (9, 9, 64, 3), bf) * 0.05
    t("tail conv9x9 64->3 @1080p bf16", lambda wg, x: conv(x, wg), k_tail,
      x1080)

    # pre-shuffle tail: same FLOPs computed at 540p with N=12
    x540_256 = jax.random.normal(rng, (1, 540, 960, 256), bf)
    k_tail_ls = jax.random.normal(rng, (5, 5, 256, 12), bf) * 0.05

    def tail_ls(wg, x):
        return pixel_shuffle(conv(x, wg), 2)

    t("tail-preshuffle conv5x5 256->12 @540p bf16", tail_ls, k_tail_ls,
      x540_256)

    k_head = jax.random.normal(rng, (9, 9, 3, 64), bf) * 0.05
    x3 = jax.random.normal(rng, (1, h, w, 3), bf)
    t("head conv9x9 3->64 @270x480 bf16", lambda wg, x: conv(x, wg), k_head,
      x3)

    # batch-8 variants of the dominant pieces
    x64b8 = jax.random.normal(rng, (8, h, w, 64), bf)
    t("32x conv3x3 64->64 @270x480 b8 bf16", trunk, k33, x64b8)
    x1080b8 = jax.random.normal(rng, (8, 1080, 1920, 64), bf)
    t("tail conv9x9 64->3 @1080p b8 bf16", lambda wg, x: conv(x, wg), k_tail,
      x1080b8, iters=4)


@section("dma2d")
def probe_dma2d():
    """Can a Mosaic DMA slice BOTH dims (row window x 128-aligned col
    window) of an ANY-space ref?  Decides the fused-VDSR width-chunking
    design: 2D DMA -> chunk in-kernel (plan A); unsupported -> XLA
    materializes overlapped chunks (plan B)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    def make(src_off, dst_off, cols, dtype, run=True):
        def kernel(x_ref, o_ref, v, sem, so):
            def step(k, _):
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(k * 64, 64), pl.ds(src_off, cols)], v, sem)
                cp.start()
                cp.wait()
                cpo = pltpu.make_async_copy(
                    v, o_ref.at[pl.ds(k * 64, 64), pl.ds(dst_off, cols)], so)
                cpo.start()
                cpo.wait()
                return 0

            jax.lax.fori_loop(0, 4, step, 0)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((256, dst_off + cols + 128),
                                               dtype),
                scratch_shapes=[
                    pltpu.VMEM((64, cols), dtype),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )(x)

        x = jnp.arange(256 * 2304, dtype=jnp.float32).astype(dtype)
        x = x.reshape(256, 2304)
        label = f"src@{src_off} dst@{dst_off} cols={cols} {dtype.__name__}"
        try:
            f.lower(x).compile()
        except Exception as e:
            print(f"  {label}: REJECTED ({str(e).splitlines()[0][:120]})",
                  flush=True)
            return
        if not run:
            print(f"  {label}: AOT OK", flush=True)
            return
        out = np.asarray(f(x))[:, dst_off : dst_off + cols]
        want = np.asarray(x)[:, src_off : src_off + cols]
        err = float(np.abs(out.astype(np.float32)
                           - want.astype(np.float32)).max())
        print(f"  {label}: AOT OK, on-device err {err:.1e}", flush=True)

    make(1024, 0, 1280, jnp.float32)          # 128-aligned src
    make(1024, 128, 1024, jnp.float32)        # 128-aligned src AND dst
    make(64, 0, 1280, jnp.float32, run=False)   # 64-aligned src offset
    make(1024, 64, 1024, jnp.float32, run=False)  # 64-aligned dst offset
    make(8, 0, 1280, jnp.float32, run=False)    # 8-aligned src offset
    make(1024, 128, 1024, jnp.bfloat16, run=False)  # bf16 col-sliced


@section("vdsrchunk")
def probe_vdsr_chunk_aot():
    """AOT-acceptance of the width-chunked fused-VDSR tile shapes: big
    row-group matmul chains at wcin=1280 lanes (vs the wp=2048 compile
    crash).  Mini-kernel mimicking one mid-segment: spanp-row bf16 slab,
    group=2 windows, 3 lane-rolls + f32 accum, 4 convs deep."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    feat = 64

    def make(spanp, wcin, nconv):
        g = 2

        def kernel(w_ref, in_ref, o_ref, b0, b1, sem_in, sem_out):
            def step(k, _):
                cp = pltpu.make_async_copy(
                    in_ref.at[pl.ds(k * spanp * feat, spanp * feat)],
                    b0.at[pl.ds(feat, spanp * feat)], sem_in)
                cp.start()
                cp.wait()
                bufs = [b0, b1]
                cur = 0
                for _li in range(nconv):
                    src, dst = bufs[cur], bufs[1 - cur]
                    for gi in range(spanp // g):
                        sl = src[pl.ds(gi * g * feat, (g + 2) * feat), :]
                        acc = None
                        for d in range(3):
                            mm = jnp.dot(w_ref[:], sl,
                                         preferred_element_type=jnp.float32)
                            if d:
                                mm = pltpu.roll(mm, wcin - d, axis=1)
                            acc = mm if acc is None else acc + mm
                        dst[pl.ds((1 + gi * g) * feat, g * feat), :] = (
                            jax.nn.relu(acc).astype(jnp.bfloat16))
                    cur = 1 - cur
                cpo = pltpu.make_async_copy(
                    bufs[cur].at[pl.ds(feat, spanp * feat)],
                    o_ref.at[pl.ds(k * spanp * feat, spanp * feat)], sem_out)
                cpo.start()
                cpo.wait()
                return 0

            jax.lax.fori_loop(0, 2, step, 0)

        @jax.jit
        def f(w, x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((2 * spanp * feat, wcin),
                                               jnp.bfloat16),
                scratch_shapes=[
                    pltpu.VMEM(((spanp + 2) * feat, wcin), jnp.bfloat16),
                    pltpu.VMEM(((spanp + 2) * feat, wcin), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )(w, x)

        w = jnp.zeros((g * feat, (g + 2) * feat), jnp.bfloat16)
        x = jnp.zeros((2 * spanp * feat, wcin), jnp.bfloat16)
        return f.lower(w, x).compile()

    import time as _t

    for spanp, wcin, nconv in [(24, 1280, 2), (40, 1280, 4), (48, 1280, 4),
                               (40, 1536, 4), (24, 2048, 2)]:
        t0 = _t.perf_counter()
        try:
            make(spanp, wcin, nconv)
            print(f"  spanp={spanp} wcin={wcin} nconv={nconv}: AOT OK "
                  f"({_t.perf_counter()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"  spanp={spanp} wcin={wcin} nconv={nconv}: REJECTED "
                  f"({str(e).splitlines()[0][:120]})", flush=True)


ALL = [probe_vmem, probe_mosaic, probe_fused2, probe_kapply, probe_xla_bf16,
       probe_vdsr_fused, probe_k2_aot, probe_srresnet_profile, probe_dma2d,
       probe_vdsr_chunk_aot]

if __name__ == "__main__":
    want = set(sys.argv[1:])
    for p in ALL:
        if not want or p._section in want:
            p()
