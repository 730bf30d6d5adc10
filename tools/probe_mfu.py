"""MFU lane-occupancy probes (VERDICT r3 weak #2/#3: the ~30% MFU plateau
on 64-feature trunks was a roofline *hypothesis* — half of the MXU's 128
lanes idle by architecture — with no experiment against it).

Probes, in value order (each row prints immediately so a timeout keeps the
earlier evidence):

  trunk64-b2     16x [3x3 conv C64->C64 + relu] on (2, 270, 480, 64)   bf16
  trunk128bd-b1  same USEFUL work as trunk64-b2: one (1, 270, 480, 128)
                 pass with BLOCK-DIAGONAL kernels (2 frames packed into
                 channels).  If a 64-wide conv really strands half the MXU,
                 this runs ~2x the useful FLOP rate at identical MACs
                 issued; if XLA already packs the systolic array, it ties.
  trunk256-b1    16x [3x3 conv C256->C256 + relu] on (1, 270, 480, 256):
                 full-lane TFLOP/s ceiling measurement (4x the MACs of
                 trunk64-b2 per layer).
  edsr-full-b1   the real 32x256 EDSR (folded tail) at 1080p x4 -> MP/s and
                 TFLOP/s vs edsr-baseline (VERDICT next #4).
  edsr-folded-bN batch scaling b1/b2/b4 + b4 as lax.map over single frames
                 (is the b4 regression a batched-conv layout property?).

Run ON THE CHIP via tools/chiplock.sh:
    with_chip timeout 2400 python tools/probe_mfu.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _iter_time  # loop-fused, latency-cancelled timing


def _row(msg):
    print(msg, file=sys.stderr, flush=True)


def trunk_probe(label, batch, ch, layers=16, hw=(270, 480), block_diag=False,
                iters=8):
    import jax
    import jax.numpy as jnp

    h, w = hw
    rng = np.random.default_rng(0)
    base = ch // 2 if block_diag else ch
    ws = []
    for _ in range(layers):
        k = (rng.standard_normal((3, 3, base, base)) * 0.05).astype(np.float32)
        if block_diag:
            kk = np.zeros((3, 3, ch, ch), np.float32)
            kk[:, :, :base, :base] = k
            kk[:, :, base:, base:] = k
            k = kk
        ws.append(jnp.asarray(k, jnp.bfloat16))
    x = jnp.asarray(rng.random((batch, h, w, ch)), jnp.bfloat16)

    def fwd(weights, inp):
        y = inp
        for kern in weights:
            dn = jax.lax.conv_dimension_numbers(
                y.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                y, kern, (1, 1), "SAME", dimension_numbers=dn)
            y = jnp.maximum(y, 0)
        return y

    dt = _iter_time(fwd, ws, x, iters=iters)
    # useful MACs: block-diag packs 2 frames of base-channel work
    eff_ch = base if block_diag else ch
    eff_batch = 2 * batch if block_diag else batch
    tflops = (2 * eff_batch * h * w * 9 * eff_ch * eff_ch * layers) / dt / 1e12
    _row(f"# {label}: {dt*1e3:.2f} ms/pass  {tflops:.1f} useful TFLOP/s "
         f"(issued MACs {'2x useful (zero blocks)' if block_diag else '= useful'})")
    return tflops


def edsr_mps(label, nb, blocks, feats, iters=4, map_frames=False):
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    ov = {"num_blocks": blocks, "features": feats}
    if feats > 64:
        ov["res_scale"] = 0.1
    m = build_model(ModelConfig(name="edsr", scale=4, channels=3, overrides=ov))
    x = jnp.asarray(np.random.default_rng(0).random((nb, 270, 480, 3)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x[:1], train=False)

    if map_frames:
        def fwd(var, inp):
            return jax.lax.map(
                lambda f: edsr_folded_forward(var["params"], f[None], 4,
                                              dtype=jnp.bfloat16)[0], inp)
    else:
        def fwd(var, inp):
            return edsr_folded_forward(var["params"], inp, 4,
                                       dtype=jnp.bfloat16)

    dt = _iter_time(fwd, v, x, iters=iters)
    mp = nb * 1080 * 1920 / 1e6
    # trunk FLOPs dominate: blocks x 2 convs x 2*HW*9*feats^2 per frame
    tfl = nb * blocks * 2 * 2 * 270 * 480 * 9 * feats * feats / dt / 1e12
    _row(f"# {label}: {mp/dt:.1f} MP/s ({dt*1e3:.2f} ms)  trunk {tfl:.1f} TFLOP/s")
    return mp / dt


def main():
    budget = 2100
    t0 = time.monotonic()

    def left():
        return budget - (time.monotonic() - t0)

    probes = [
        ("trunk64-b2", lambda: trunk_probe("trunk64-b2", 2, 64)),
        ("trunk128bd-b1", lambda: trunk_probe("trunk128bd-b1", 1, 128,
                                              block_diag=True)),
        ("trunk256-b1", lambda: trunk_probe("trunk256-b1", 1, 256, iters=4)),
        ("edsr-full-b1", lambda: edsr_mps("edsr-full-folded-bf16-b1", 1, 32, 256,
                                          iters=2)),
        ("edsr-base-b1", lambda: edsr_mps("edsr-folded-bf16-b1", 1, 16, 64)),
        ("edsr-base-b2", lambda: edsr_mps("edsr-folded-bf16-b2", 2, 16, 64)),
        ("edsr-base-b4", lambda: edsr_mps("edsr-folded-bf16-b4", 4, 16, 64)),
        ("edsr-base-b4-map", lambda: edsr_mps("edsr-folded-bf16-b4-laxmap", 4,
                                              16, 64, map_frames=True)),
        ("trunk64-b1", lambda: trunk_probe("trunk64-b1", 1, 64)),
        ("trunk128-b1", lambda: trunk_probe("trunk128-b1 (plain, 4x MACs)",
                                            1, 128)),
    ]
    for name, fn in probes:
        if left() < 120:
            _row(f"# probe budget exhausted before {name}")
            break
        try:
            fn()
        except Exception as e:
            _row(f"# {name} failed: {e}")
    _row("# probe_mfu done")


if __name__ == "__main__":
    main()
