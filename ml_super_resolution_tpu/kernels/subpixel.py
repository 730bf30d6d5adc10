"""K1: fused sub-pixel head — 3x3 conv to r^2*C channels + in-kernel
depth-to-space rows, one VMEM-resident pass (SURVEY §2b K1, §7 hard part #4).

Why fuse: the sub-pixel head's conv output (``r^2*C`` channels at LR
resolution) is exactly the data volume of the final HR image; materializing
it in HBM and re-reading it for the shuffle doubles the head's HBM traffic.
Here the conv accumulates in VMEM as nine MXU matmuls (one per tap) and the
sub-pixel rows are interleaved in the epilogue before the single HBM write;
the final lane interleave is a free row-major reshape in the wrapper.

Mosaic constraints shaping the design (probed on v5e):
* no lane-dim (minor-most) reshape splits/merges in-kernel — hence the
  row-interleaved ``(N, rH, W, r*C)`` output layout;
* DMA slices need 128-aligned minors — channels are zero-padded to 128,
  which also makes every tap matmul exactly one MXU pass;
* halos cannot be expressed with overlapping BlockSpecs — each grid step
  reads its own row block plus the *next* block and concatenates the two
  rows it needs (standard pipelined loads, no manual DMA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = ["conv_pixel_shuffle", "conv_pixel_shuffle_reference"]


def conv_pixel_shuffle_reference(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, r: int
) -> jnp.ndarray:
    """XLA reference: SAME 3x3 conv + pixel shuffle (the golden semantics)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    return pixel_shuffle(y + b, r)


def _kernel(cur_ref, nxt_ref, w_ref, b_ref, out_ref, *, tile_h, width, cin, r, cout):
    # (tile_h + 2)-row slab: own rows + first two rows of the next block.
    xv = jnp.concatenate([cur_ref[0], nxt_ref[0, :2]], axis=0)
    r2c = r * r * cout
    rc = r * cout
    acc = jnp.zeros((tile_h * width, r2c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xv[dy : dy + tile_h, dx : dx + width, :]
            acc += jnp.dot(
                patch.reshape(tile_h * width, cin),
                w_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[:].reshape(1, r2c)
    # Row-interleave epilogue (lane interleave deferred to the wrapper):
    #   out[(h, i), w, (j, c)] = acc[(h, w), (i, j, c)]
    accs = acc.reshape(tile_h, width, r2c)  # split major: OK
    rows = [accs[:, :, i * rc : (i + 1) * rc] for i in range(r)]  # lane slices
    stacked = jnp.stack(rows, axis=1)  # (th, r, w, rc)
    out_ref[0] = stacked.reshape(tile_h * r, width, rc).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "tile_h", "interpret"))
def conv_pixel_shuffle(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    r: int,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SAME 3x3 conv (Cin -> r^2*C) + depth-to-space.

    x: (N, H, W, Cin) f32/bf16; w: (3, 3, Cin, r^2*C); b: (r^2*C,).
    Returns (N, rH, rW, C) in x.dtype.  H must divide by ``tile_h``.
    """
    n, h, width, cin = x.shape
    r2c = w.shape[-1]
    cout = r2c // (r * r)
    if h % tile_h:
        raise ValueError(f"H={h} not divisible by tile_h={tile_h}")
    cpad = max(128, -(-cin // 128) * 128) if not interpret else cin
    # rows: 1 top pad + (tile_h - 1) bottom pad => (h + tile_h) rows, so the
    # "next block" of the last row block is a valid (padding) block.
    xp = jnp.pad(x, ((0, 0), (1, tile_h - 1), (1, 1), (0, cpad - cin)))
    w_flat = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0))).reshape(
        9, cpad, r2c
    )

    kernel = functools.partial(
        _kernel, tile_h=tile_h, width=width, cin=cpad, r=r, cout=cout
    )
    grid = (n, h // tile_h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, width + 2, cpad), lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, width + 2, cpad), lambda ni, hi: (ni, hi + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h * r, width, r * cout),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h * r, width, r * cout), x.dtype),
        interpret=interpret,
    )(xp, xp, w_flat, b)
    return out.reshape(n, h * r, width * r, cout)  # free row-major merge
