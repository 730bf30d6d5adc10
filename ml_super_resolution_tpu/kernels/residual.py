"""K2: fused residual head — last 3x3 conv + global residual add (VDSR).

VDSR's output layer computes ``bicubic_input + conv(features)``
(arXiv:1511.04587 §3.2).  Unfused, XLA writes the conv result to HBM and
reads it back for the add; fusing the skip-add into the conv epilogue makes
the head a single HBM write.  Grid-free per-row-matmul structure identical
to ``subpixel.py`` (see the Mosaic/attach-path constraints there), plus a
second DMA stream for the skip slab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv_residual_add", "conv_residual_add_reference"]


def conv_residual_add_reference(
    feats: jnp.ndarray, skip: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """XLA reference: skip + SAME 3x3 conv(feats) + bias."""
    dn = jax.lax.conv_dimension_numbers(feats.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(feats, w, (1, 1), "SAME", dimension_numbers=dn)
    return skip + y + b


# Mosaic rejects kernels whose scoped-VMEM stack exceeds 16 MB on this
# target (measured: a 17.00M scratch at 1080p fails AOT with "exceeded
# scoped vmem limit").  Keep a margin for the kernel's own temporaries.
_VMEM_SCRATCH_BUDGET = 15 * 1024 * 1024


def _pick_tile(h: int, cpad: int, cout: int, wp: int) -> int:
    """Largest tile height whose scratch slabs fit the scoped-VMEM budget.

    Scratch = input slab (th+2, cpad, wp) + skip & out slabs (th, cout, wp),
    all f32.  Round 2's driver bench showed the un-budgeted pick (th=32)
    failing to compile at 1080p: (34*64*2048)*4 B = 17 MB > the 16 MB cap.

    Additionally, tpu_compile_helper crashes on row-spans of 24/32 at
    wp>=2048 (bisected round 2; re-confirmed by the k2aot probe: th=24
    REJECTED, th=16 compiles in 2.5 s) — so wide rows cap the tile at 16.
    """
    candidates = (16, 8) if wp >= 2048 else (32, 24, 16, 8)
    for th in candidates:
        scratch = ((th + 2) * cpad + 2 * th * cout) * wp * 4
        if th <= h and scratch <= _VMEM_SCRATCH_BUDGET:
            return th
    return 8


def _kernel(fp_ref, sk_ref, w_ref, b_ref, out_ref, fv, sv, ov, s_in, s_sk, s_out,
            *, n, nb, th, width, wp, cin, cout):
    def step(k, _):
        ni = k // nb
        hi = k % nb
        src = (ni * (nb * th + 2) + hi * th) * cin
        cp = pltpu.make_async_copy(fp_ref.at[pl.ds(src, (th + 2) * cin)], fv, s_in)
        cp.start()
        sks = (ni * nb + hi) * th * cout
        cs = pltpu.make_async_copy(sk_ref.at[pl.ds(sks, th * cout)], sv, s_sk)
        cs.start()
        cp.wait()
        cs.wait()

        fv_all = fv[:, :]
        variants = [
            [
                (
                    fv_all[h_ * cin : (h_ + 1) * cin, :]
                    if dx == 0
                    else pltpu.roll(
                        fv_all[h_ * cin : (h_ + 1) * cin, :], wp - dx, axis=1
                    )
                )
                for dx in range(3)
            ]
            for h_ in range(th + 2)
        ]
        rows = []
        for h_ in range(th):
            panel = jnp.concatenate(
                [variants[h_ + dy][dx] for dy in range(3) for dx in range(3)],
                axis=0,
            )
            rows.append(
                jnp.dot(w_ref[:], panel, preferred_element_type=jnp.float32)
                + b_ref[:]
            )  # (cout, wp)
        acc = jnp.stack(rows, axis=1)  # (cout, th, wp)
        conv_rows = jnp.concatenate([acc[c] for c in range(cout)], axis=0)
        # skip slab is row-major (th*cout, wp) in (row, channel-plane) order:
        # reorder conv rows to match via the same plane-concat convention
        ov[:, :] = conv_rows + sv[:, :]
        dst = (ni * nb + hi) * th * cout
        cpo = pltpu.make_async_copy(ov, out_ref.at[pl.ds(dst, th * cout)], s_out)
        cpo.start()
        cpo.wait()
        return 0

    jax.lax.fori_loop(0, n * nb, step, 0)


def conv_residual_add(
    feats: jnp.ndarray,
    skip: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    tile_h: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``skip + conv3x3(feats) + b``.

    feats: (N, H, W, Cin); skip: (N, H, W, Cout); w: (3, 3, Cin, Cout).
    ``interpret=None`` auto-selects off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # wp=4096 (4K frames) crashes tpu_compile_helper at ANY tile height
    # (k2aot probe, round 3) — route ultra-wide frames to the XLA reference
    # rather than risk a compile crash.  1080p (wp=2048) is AOT-verified.
    wp = -(-(feats.shape[2] + 2) // 128) * 128
    if not interpret and wp > 2048:
        return conv_residual_add_reference(feats, skip, w, b)
    return _conv_residual_add(feats, skip, w, b, interpret, tile_h)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def _conv_residual_add(feats, skip, w, b, interpret, tile_h=None):
    n, h, width, cin = feats.shape
    cout = w.shape[-1]
    cpad = -(-cin // 8) * 8
    wp = -(-(width + 2) // 128) * 128
    th = tile_h if tile_h is not None else _pick_tile(h, cpad, cout, wp)
    hp = -(-h // th) * th
    nb = hp // th

    fq = jnp.transpose(feats, (0, 1, 3, 2))  # (N, H, Cin, W)
    fp = jnp.zeros((n, hp + 2, cpad, wp), jnp.float32)
    fp = fp.at[:, 1 : 1 + h, :cin, 1 : 1 + width].set(fq.astype(jnp.float32))
    fp = fp.reshape(n * (hp + 2) * cpad, wp)

    # skip, channel-planar per block row group: (N, hp, Cout, Wp)
    sq = jnp.transpose(skip, (0, 1, 3, 2))  # (N, H, Cout, W)
    sp = jnp.zeros((n, hp, cout, wp), jnp.float32)
    sp = sp.at[:, :h, :, :width].set(sq.astype(jnp.float32))
    # reorder to (N, nb, Cout, th, Wp) plane-major to match the kernel concat
    sp = sp.reshape(n, nb, th, cout, wp).transpose(0, 1, 3, 2, 4)
    sp = sp.reshape(n * hp * cout, wp)

    wm = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    wm = jnp.transpose(wm, (3, 0, 1, 2)).reshape(cout, 9 * cpad).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, n=n, nb=nb, th=th, width=width, wp=wp, cin=cpad, cout=cout
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n * hp * cout, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * cpad, wp), jnp.float32),
            pltpu.VMEM((th * cout, wp), jnp.float32),
            pltpu.VMEM((th * cout, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(fp, sp, wm, b.reshape(cout, 1).astype(jnp.float32))

    # (n, nb, cout, th, wp) -> NHWC
    out = out.reshape(n, nb, cout, th, wp)[..., :width]
    out = jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(n, hp, width, cout)
    return out[:, :h].astype(skip.dtype)
