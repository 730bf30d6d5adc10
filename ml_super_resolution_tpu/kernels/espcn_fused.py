"""Fully-fused ESPCN inference kernel: 3 conv layers + sub-pixel rows in VMEM.

The flagship throughput path (BASELINE.json:5 headline metric).  Under XLA,
ESPCN's inter-layer activations (64 then 32 channels at LR resolution) make
two HBM round trips and the tiny channel counts leave the MXU underfed
(~11 TF/s effective measured on v5e).  This kernel keeps the whole network
in VMEM per row-block:

* **W-lane layout**: per-row activations live as ``(C, Wp)`` planes with the
  padded image width on lanes — C is too small to be a useful lane dim, W is
  not.  Each conv output row is ONE MXU matmul with a tap-concatenated
  contraction: ``(Cout, 9*Cin) @ (9*Cin, Wp)`` — K=576 for conv2, far better
  MXU feeding than XLA's K=64 spatial conv.  dx taps are realigned with
  ``pltpu.roll`` (variants hoisted and shared across consumer rows).
* **Grid-free**: a single program ``fori_loop``s over row blocks with manual
  sublane-aligned HBM<->VMEM DMA (gridded pallas_call hangs on this TPU
  attach path; see kernels/__init__ notes).
* **Sub-pixel epilogue**: sub-pixel channels are emitted as channel-planar
  row groups (plain 2D concats); the (i, j) permutation + lane interleave is
  one XLA transpose in the wrapper (lane-dim reshapes are unsupported
  in-kernel).

Measured on v5e: 3.5 ms for an 8-frame 270x480 -> 1080p x4 batch (~4,700
MP/s), ~25% faster than the XLA f32 path.  Golden-tested against the flax
ESPCN apply in tests/test_kernels.py (max err ~1e-3 at large sizes: Mosaic
matmuls round through bf16 passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["espcn_fused_forward", "extract_espcn_weights"]


def extract_espcn_weights(params) -> dict:
    """Pull (w1, b1, w2, b2, w3, b3) out of an ESPCN flax param tree."""
    w1 = params["Conv_0"]["kernel"]  # (5, 5, 1, f1)
    b1 = params["Conv_0"]["bias"]
    w2 = params["Conv_1"]["kernel"]  # (3, 3, f1, f2)
    b2 = params["Conv_1"]["bias"]
    inner = params["ICNRConvPixelShuffle_0"]["Conv_0"]
    w3 = inner["kernel"]  # (3, 3, f2, r^2)
    b3 = inner["bias"]
    return dict(w1=w1, b1=b1, w2=w2, b2=b2, w3=w3, b3=b3)


def _pick_tile(h: int) -> int:
    """Row-block height: must be a multiple of 8 — DMA source row offsets
    need sublane alignment (unaligned offsets fault the TPU worker).
    Height padding (hp) handles non-divisible h, so use the largest block
    that doesn't overshoot the frame: fewer loop iterations + DMAs."""
    for th in (32, 24, 16, 8):
        if th <= h or h % th == 0:
            return th
    return 8


def _kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            xv, ov, sin, sout, *, n, nb, th, h, width, wp, f1, f2, r, cdt):
    r2 = r * r

    # Mosaic constraint driving this structure: any shape cast that merges or
    # splits the minor (lane) dim is unsupported, which rules out both
    # im2col reshapes and dot_general with 3D operands (it flattens
    # internally).  So each conv is per-output-row: the receptive rows/cols
    # are concatenated along the MAJOR dim into a (taps*Cin, W) panel and hit
    # with one 2D MXU matmul — K = taps*Cin (576 for conv2: better MXU
    # utilization than XLA's K=64 spatial conv).

    def conv_rows(src_rows, w_cat, taps_hw, n_rows):
        """src_rows: list of 2D (C_in, wp) planes; returns per-row conv outs.

        Every plane/panel keeps the full lane-aligned width wp: Mosaic
        rejects concats/rolls built from values with non-128-multiple lane
        extents, and dx-taps are realigned with pltpu.roll so each
        concatenated piece has lane offset 0.  Garbage in the wrapped-around
        columns is killed by the per-layer validity masks / final crop.
        Rolled variants are computed once per source row and shared across
        the kh output rows that consume it (rolls are the VPU hot spot).
        """
        kh, kw = taps_hw
        variants = [
            [
                (
                    plane
                    if dx == 0
                    # left-rotate by dx == right-rotate by (wp - dx)
                    else pltpu.roll(plane, plane.shape[1] - dx, axis=1)
                )
                for dx in range(kw)
            ]
            for plane in src_rows[: n_rows + kh - 1]
        ]
        rows = []
        for h_ in range(n_rows):
            # one K = kh*kw*C_in matmul per row: the panel concat costs a
            # VMEM copy but beats kh*kw accumulated K=C_in dots (measured
            # 3.46 ms vs 4.20 ms for the 1080p batch on v5e)
            pieces = [
                variants[h_ + dy][dx] for dy in range(kh) for dx in range(kw)
            ]
            panel = jnp.concatenate(pieces, axis=0)  # (kh*kw*C_in, wp)
            rows.append(
                jnp.dot(
                    w_cat,
                    panel.astype(cdt),
                    preferred_element_type=jnp.float32,
                )
            )
        return rows  # list of (C_out, wp)

    def step(k, _):
        ni = k // nb
        hi = k % nb
        src_row = ni * (nb * th + 8) + hi * th  # all multiples of 8
        cp = pltpu.make_async_copy(xp_ref.at[pl.ds(src_row, th + 8)], xv, sin)
        cp.start()
        cp.wait()

        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        base = hi * th

        # conv1 5x5 (1 -> f1), rows (th+4), tanh + halo re-zero.
        # Single-sublane pieces can't be concatenated (offset/layout rules),
        # so conv1 panels bundle the dy taps: piece(dx) = 5 consecutive rows
        # of the dx-rolled slab, rolled to the front for offset 0; panel is
        # (25, W+4) with (dx, dy) column order (w1 pre-permuted to match).
        xv_all = xv[:, :]
        slab_rows = th + 8
        xv_dx = [
            xv_all if dx == 0 else pltpu.roll(xv_all, wp - dx, axis=1)
            for dx in range(5)
        ]
        rows1 = []
        for h_ in range(th + 4):
            pieces = [
                (
                    xv_dx[dx][0:5, :]
                    if h_ == 0
                    else pltpu.roll(xv_dx[dx], slab_rows - h_, axis=0)[0:5, :]
                )
                for dx in range(5)
            ]
            panel = jnp.concatenate(pieces, axis=0)  # (25, wp)
            rows1.append(
                jnp.dot(
                    w1_ref[:], panel.astype(cdt),
                    preferred_element_type=jnp.float32,
                )
            )
        out1_rows = []
        for h_, row in enumerate(rows1):
            v = jnp.tanh(row + b1_ref[:])
            gr = base + h_ - 2  # global row index of this out1 row
            valid_r = jnp.logical_and(gr >= 0, gr < h)
            # out1 col c holds original col c-2: valid iff 2 <= c < width+2
            valid_c = jnp.logical_and(col_i >= 2, col_i < width + 2)
            # flax SAME gives conv2 literal zeros outside the frame
            v = jnp.where(jnp.logical_and(valid_r, valid_c), v, 0.0)
            out1_rows.append(v)

        # conv2 3x3 (f1 -> f2), rows (th+2), tanh + halo re-zero.
        rows2 = conv_rows(out1_rows, w2_ref[:], (3, 3), th + 2)
        out2_rows = []
        for h_, row in enumerate(rows2):
            v = jnp.tanh(row + b2_ref[:])
            gr = base + h_ - 1
            valid_r = jnp.logical_and(gr >= 0, gr < h)
            # out2 col c holds original col c-1: valid iff 1 <= c < width+1
            valid_c = jnp.logical_and(col_i >= 1, col_i < width + 1)
            v = jnp.where(jnp.logical_and(valid_r, valid_c), v, 0.0)
            out2_rows.append(v)

        # conv3 3x3 (f2 -> r^2), rows th.
        rows3 = conv_rows(out2_rows, w3_ref[:], (3, 3), th)
        acc3 = jnp.stack([row + b3_ref[:] for row in rows3], axis=1)
        # acc3: (r2, th, wp); cols >= width are garbage, cropped by wrapper

        # Emit channel-planar rows: block (ni, hi) writes r2 contiguous
        # (th, W) planes — plain 2D slices + concat only (Mosaic rejects
        # reshapes that merge transposed majors); the (i, j) sub-pixel
        # permutation is one XLA transpose in the wrapper.
        planes = jnp.concatenate([acc3[k] for k in range(r2)], axis=0)
        ov[:, :] = planes  # (r2*th, wp)
        dst_row = (ni * nb + hi) * th * r2
        cpo = pltpu.make_async_copy(ov, out_ref.at[pl.ds(dst_row, th * r2)], sout)
        cpo.start()
        cpo.wait()
        return 0

    ov[:, :] = jnp.zeros((ov.shape[0], ov.shape[1]), ov.dtype)
    jax.lax.fori_loop(0, n * nb, step, 0)


def espcn_fused_forward(
    weights: dict,
    x: jnp.ndarray,
    scale: int,
    interpret: bool | None = None,
    bf16: bool = False,
) -> jnp.ndarray:
    """Fused ESPCN forward.  x: (N, H, W) or (N, H, W, 1) Y-channel in [0,1].

    Returns (N, r*H, r*W, 1) f32, numerically matching the flax ESPCN apply
    (f32 accumulation; ``bf16=True`` runs matmul operands in bf16 for ~2x MXU
    rate at ~1e-2 absolute pixel error).  ``interpret=None`` auto-selects
    interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _espcn_fused_forward(weights, x, scale, interpret, bf16)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "bf16"))
def _espcn_fused_forward(
    weights: dict, x: jnp.ndarray, scale: int, interpret: bool = False,
    bf16: bool = False,
) -> jnp.ndarray:
    if x.ndim == 4:
        x = x[..., 0]
    n, h, width = x.shape
    r = scale
    r2 = r * r
    w1, b1 = weights["w1"], weights["b1"]
    w2, b2 = weights["w2"], weights["b2"]
    w3, b3 = weights["w3"], weights["b3"]
    f1 = w1.shape[-1]
    f2 = w2.shape[-1]
    assert w3.shape[-1] == r2, "fused path supports channels=1 (Y protocol)"

    cdt = jnp.bfloat16 if bf16 else jnp.float32
    th = _pick_tile(h)
    hp = -(-h // th) * th  # height padded to the block grid (zeros below)
    nb = hp // th
    wp = -(-(width + 8) // 128) * 128
    # rows: 4 top halo + (pad + 4) bottom halo per frame; flattened to 2D so
    # every DMA offset (multiples of th=8k and hp+8) stays sublane-aligned.
    # slab stays f32: bf16 sublane rolls are unsupported by Mosaic; panels
    # are cast to the compute dtype right before each matmul instead
    xp = jnp.zeros((n, hp + 8, wp), jnp.float32).at[:, 4 : 4 + h, 4 : 4 + width].set(
        x.astype(jnp.float32)
    )
    xp = xp.reshape(n * (hp + 8), wp)

    # tap-concatenated weight layouts matching the per-row panels:
    # conv1 columns ordered (dx, dy) per the bundled-dy panel construction;
    # conv2/3 columns ordered (dy, dx) outer, input channel inner
    w1m = jnp.transpose(w1[:, :, 0, :], (2, 1, 0)).reshape(f1, 25).astype(cdt)
    w2m = jnp.transpose(w2, (3, 0, 1, 2)).reshape(f2, 9 * f1).astype(cdt)
    w3m = jnp.transpose(w3, (3, 0, 1, 2)).reshape(r2, 9 * f2).astype(cdt)

    kernel = functools.partial(
        _kernel, n=n, nb=nb, th=th, h=h, width=width, wp=wp, f1=f1, f2=f2, r=r,
        cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n * hp * r2, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 8, wp), jnp.float32),
            pltpu.VMEM((th * r2, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1m, b1.reshape(f1, 1), w2m, b2.reshape(f2, 1), w3m, b3.reshape(r2, 1))

    # Undo the channel-planar block layout in XLA (one transposed copy):
    # rows are ((ni, hi) block, (i, j) plane, t) -> (n, h, i, w, j).
    out = out.reshape(n, nb, r, r, th, wp)[..., :width]
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3))  # (n, nb, th, r_i, W, r_j)
    out = out.reshape(n, hp * r, width * r, 1)
    return out[:, : h * r]  # crop height padding
