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


def _pick_tile(h: int) -> int:
    for th in (32, 24, 16, 8):
        if th <= h or h % th == 0:
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
    return _conv_residual_add(feats, skip, w, b, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv_residual_add(feats, skip, w, b, interpret):
    n, h, width, cin = feats.shape
    cout = w.shape[-1]
    cpad = -(-cin // 8) * 8
    th = _pick_tile(h)
    hp = -(-h // th) * th
    nb = hp // th
    wp = -(-(width + 2) // 128) * 128

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
