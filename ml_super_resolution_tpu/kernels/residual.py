"""K2: fused residual head — last 3x3 conv + global residual add (VDSR).

VDSR's output layer computes ``bicubic_input + conv(features)``
(arXiv:1511.04587 §3.2).  Unfused, XLA writes the conv result to HBM and
reads it back for the add; fusing the skip-add into the conv epilogue makes
the head a single HBM write.  Same two-block halo structure and channel
padding as ``subpixel.py`` (see the Mosaic constraints documented there).
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


def _kernel(cur_ref, nxt_ref, skip_ref, w_ref, b_ref, out_ref,
            *, tile_h, width, cin, cout):
    fv = jnp.concatenate([cur_ref[0], nxt_ref[0, :2]], axis=0)
    acc = jnp.zeros((tile_h * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = fv[dy : dy + tile_h, dx : dx + width, :]
            acc += jnp.dot(
                patch.reshape(tile_h * width, cin),
                w_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[:].reshape(1, cout)
    out = acc.reshape(tile_h, width, cout) + skip_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def conv_residual_add(
    feats: jnp.ndarray,
    skip: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``skip + conv3x3(feats) + b``.

    feats: (N, H, W, Cin); skip: (N, H, W, Cout); w: (3, 3, Cin, Cout).
    """
    n, h, width, cin = feats.shape
    cout = w.shape[-1]
    if h % tile_h:
        raise ValueError(f"H={h} not divisible by tile_h={tile_h}")
    cpad = max(128, -(-cin // 128) * 128) if not interpret else cin
    fp = jnp.pad(feats, ((0, 0), (1, tile_h - 1), (1, 1), (0, cpad - cin)))
    w_flat = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0))).reshape(
        9, cpad, cout
    )

    kernel = functools.partial(
        _kernel, tile_h=tile_h, width=width, cin=cpad, cout=cout
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, width + 2, cpad), lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, width + 2, cpad), lambda ni, hi: (ni, hi + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, width, cout), lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, cout), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), skip.dtype),
        interpret=interpret,
    )(fp, fp, skip, w_flat, b)
