"""Fully-fused ESPCN v2: row-group matmuls, output-roll dx alignment, bf16.

Second-generation rewrite of ``espcn_fused.py`` driven by its measured
bottleneck: v1 is VPU/relayout-bound (per-output-row panel concats + a
sublane roll per (row, tap) in conv1), so its bf16 operand mode bought
nothing and it lost to plain bf16-XLA on the stock model.  v2 restructures
every conv so the VPU does almost nothing and the MXU runs large matmuls:

* **Row groups on M**: G output rows x C_out channels form one matmul of
  M = G*C_out (512 / 128 / 128 here vs v1's M = 64/32/16), with the group's
  weight matrix pre-assembled so each output row selects its dy taps.  The
  K dim carries (rows-window x C_in); the extra zero-weight MACs (K window
  1.5-3.3x the taps actually used) are bought back many times over by full
  MXU occupancy and ~10x fewer matmul/VPU invocations.
* **Output-roll dx alignment** (conv2/conv3): instead of building three
  dx-shifted copies of the activations (v1's hoisted variants) the kernel
  runs one matmul per dx tap on the *unshifted* buffer slice and lane-rolls
  the (M, W) result by ±1 — 2 small rolls per group instead of 2 full-slab
  rolls + per-row concats.  SAME-padding correctness holds because invalid
  columns are zero-masked after each layer, so wrapped-in garbage always
  multiplies/lands on zeros or masked columns.
* **Aligned-slice panels**: activation buffers are row-major
  ``(row * C, Wp)`` so every group's K-window is a 64/32-sublane-aligned
  contiguous slice — no relayout, no copy, directly consumable by the MXU.
* **bf16 operands** (``bf16=True``, default): buffers are stored in bf16
  (cast once at the tanh epilogue), weights pre-cast; accumulation stays
  f32 via ``preferred_element_type``.  v1 couldn't exploit bf16 because
  Mosaic lacks bf16 sublane rolls — v2 never rolls activations.

Grid-free single-program structure with manual sublane-aligned DMA, as
required on this TPU attach path (see kernels/__init__ and the memory
notes).  Golden-tested against the flax ESPCN apply; wired to
``sr upscale --pallas`` in infer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ml_super_resolution_tpu.kernels.espcn_fused import extract_espcn_weights

__all__ = ["espcn_fused2_forward", "extract_espcn_weights"]

_G1, _G2, _G3 = 8, 4, 8  # row-group sizes per conv


def _pick_tile(h: int) -> int:
    """Output rows per block; multiple of _G1/_G3 (8) for aligned slices."""
    for tb in (32, 24, 16, 8):
        if tb <= h or h % tb == 0:
            return tb
    return 8


def _kernel(xp_ref, w1_ref, w2a, w2b, w2c, w3a, w3b, w3c,
            b1_ref, b2_ref, b3_ref, out_ref,
            xv, o1, o2, ov, sin, sout,
            *, n, nb, tb, h, width, wp, f1, f2, r2, cdt):
    w2_refs = (w2a, w2b, w2c)
    w3_refs = (w3a, w3b, w3c)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    # out1 cols hold image col j-2 (valid [2, w+2)); out2 j-1 (valid [1, w+1))
    c1_ok = jnp.logical_and(col >= 2, col < width + 2)
    c2_ok = jnp.logical_and(col >= 1, col < width + 1)

    def row_mask(base, gb, g, c):
        m = jax.lax.broadcasted_iota(jnp.int32, (g * c, 1), 0)
        t = base + gb + m // c
        return jnp.logical_and(t >= 0, t < h)

    def step(k, _):
        ni = k // nb
        hi = k % nb
        base = hi * tb
        src = ni * (nb * tb + 8) + base
        cp = pltpu.make_async_copy(xp_ref.at[pl.ds(src, tb + 8)], xv.at[0 : tb + 8], sin)
        cp.start()
        cp.wait()

        # ---- conv1 5x5 (1 -> f1), tanh: groups of G1 rows ------------------
        # slab5[d] = slab shifted so col j reads image col j-2+(d-2)+... :
        # tap (dy, dx=d-2) of out1 col j = slab5[d][t+2+dy, j]
        slab = xv[:, :]
        slab5 = [
            slab if d == 0 else pltpu.roll(slab, wp - d, axis=1) for d in range(5)
        ]
        for gi in range((tb + 8) // _G1):  # t in [gb, gb+G1), gb = -2 + 8*gi
            gb = -2 + _G1 * gi
            panel = jnp.concatenate(
                [s5[gb + 2 : gb + 18] for s5 in slab5], axis=0
            )  # (80, wp); slices 8-aligned (gb+2 multiple of 8)
            mm = jnp.dot(
                w1_ref[:], panel.astype(cdt), preferred_element_type=jnp.float32
            )  # (G1*f1, wp)
            v = jnp.tanh(mm + b1_ref[:])
            ok = jnp.logical_and(row_mask(base, gb, _G1, f1), c1_ok)
            o1[pl.ds((gb + 2) * f1, _G1 * f1), :] = jnp.where(ok, v, 0.0).astype(
                o1.dtype
            )

        # ---- conv2 3x3 (f1 -> f2), tanh: groups of G2 rows, output rolls ---
        n2 = -(-(tb + 2) // _G2)
        for gi in range(n2):  # t in [gb, gb+G2), gb = -1 + G2*gi
            gb = -1 + _G2 * gi
            sl = o1[pl.ds((gb + 1) * f1, (_G2 + 2) * f1), :]
            acc = None
            for d in range(3):
                mm = jnp.dot(
                    w2_refs[d][:], sl.astype(cdt),
                    preferred_element_type=jnp.float32,
                )  # (G2*f2, wp)
                if d:  # out[j] = sum_d mm_d[j + d]: left-rotate by d
                    mm = pltpu.roll(mm, wp - d, axis=1)
                acc = mm if acc is None else acc + mm
            v = jnp.tanh(acc + b2_ref[:])
            ok = jnp.logical_and(row_mask(base, gb, _G2, f2), c2_ok)
            o2[pl.ds((gb + 1) * f2, _G2 * f2), :] = jnp.where(ok, v, 0.0).astype(
                o2.dtype
            )

        # ---- conv3 3x3 (f2 -> r2): groups of G3 rows, output rolls ---------
        for gi in range(tb // _G3):  # t in [gb, gb+G3), gb = G3*gi
            gb = _G3 * gi
            sl = o2[pl.ds(gb * f2, (_G3 + 2) * f2), :]
            acc = None
            for d in range(3):
                mm = jnp.dot(
                    w3_refs[d][:], sl.astype(cdt),
                    preferred_element_type=jnp.float32,
                )  # (G3*r2, wp)
                if d:  # out[j] = sum_d mm_d[j + d]: left-rotate by d
                    mm = pltpu.roll(mm, wp - d, axis=1)
                acc = mm if acc is None else acc + mm
            ov[pl.ds(gb * r2, _G3 * r2), :] = acc + b3_ref[:]

        dst = (ni * nb + hi) * tb * r2
        cpo = pltpu.make_async_copy(ov, out_ref.at[pl.ds(dst, tb * r2)], sout)
        cpo.start()
        cpo.wait()
        return 0

    # zero once: rows the DMA never writes (bottom pad of the input slab)
    xv[:, :] = jnp.zeros((xv.shape[0], xv.shape[1]), xv.dtype)
    jax.lax.fori_loop(0, n * nb, step, 0)


def _group_weights(w1, w2, w3, f1, f2, r2, cdt):
    """Assemble the row-group weight matrices (see module doc).

    W1  (G1*f1, 5*16):  cols d*16 + (k+dy) <- w1[dy, d, 0, c]
    W2d (G2*f2, (G2+2)*f1): cols (k+dy)*f1 + ci <- w2[dy, d, ci, c]
    W3d (G3*r2, (G3+2)*f2): cols (k+dy)*f2 + ci <- w3[dy, d, ci, c]
    Row index m = k*C_out + c.
    """
    w1m = jnp.zeros((_G1 * f1, 5 * 16), jnp.float32)
    for k in range(_G1):
        for d in range(5):
            # (5, f1) taps for this (k, d) start at col d*16 + k
            w1m = jax.lax.dynamic_update_slice(
                w1m, w1[:, d, 0, :].T.astype(jnp.float32), (k * f1, d * 16 + k)
            )
    w2m = []
    for d in range(3):
        m = jnp.zeros((_G2 * f2, (_G2 + 2) * f1), jnp.float32)
        blk = jnp.transpose(w2[:, d], (2, 0, 1)).reshape(f2, 3 * f1)  # (f2, 3*f1)
        for k in range(_G2):
            m = jax.lax.dynamic_update_slice(m, blk, (k * f2, k * f1))
        w2m.append(m.astype(cdt))
    w3m = []
    for d in range(3):
        m = jnp.zeros((_G3 * r2, (_G3 + 2) * f2), jnp.float32)
        blk = jnp.transpose(w3[:, d], (2, 0, 1)).reshape(r2, 3 * f2)
        for k in range(_G3):
            m = jax.lax.dynamic_update_slice(m, blk, (k * r2, k * f2))
        w3m.append(m.astype(cdt))
    return w1m.astype(cdt), w2m, w3m


def espcn_fused2_forward(
    weights: dict,
    x: jnp.ndarray,
    scale: int,
    interpret: bool | None = None,
    bf16: bool = True,
) -> jnp.ndarray:
    """Fused ESPCN v2 forward.  x: (N, H, W[, 1]) Y in [0,1] -> (N, rH, rW, 1).

    ``bf16=True`` runs matmul operands (weights, activations) in bf16 with
    f32 accumulation — ~1e-2 absolute activation error, visually and
    PSNR-irrelevant; ``bf16=False`` matches the flax apply to ~1e-5.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _espcn_fused2(weights, x, scale, interpret, bf16)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "bf16"))
def _espcn_fused2(weights, x, scale, interpret, bf16):
    if x.ndim == 4:
        x = x[..., 0]
    n, h, width = x.shape
    r = scale
    r2 = r * r
    w1, b1 = weights["w1"], weights["b1"]
    w2, b2 = weights["w2"], weights["b2"]
    w3, b3 = weights["w3"], weights["b3"]
    f1, f2 = w1.shape[-1], w2.shape[-1]
    assert w3.shape[-1] == r2, "fused path supports channels=1 (Y protocol)"
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    tb = _pick_tile(h)
    hp = -(-h // tb) * tb
    nb = hp // tb
    wp = -(-(width + 8) // 128) * 128

    # frame-planar input with 4-row top halo per frame (all DMA offsets x8);
    # image at col offset 4 so conv1's widest tap stays in-bounds
    xp = jnp.zeros((n, hp + 8, wp), jnp.float32)
    xp = xp.at[:, 4 : 4 + h, 4 : 4 + width].set(x.astype(jnp.float32))
    xp = xp.reshape(n * (hp + 8), wp)

    w1m, w2m, w3m = _group_weights(w1, w2, w3, f1, f2, r2, cdt)
    b1t = jnp.tile(b1, _G1).reshape(_G1 * f1, 1).astype(jnp.float32)
    b2t = jnp.tile(b2, _G2).reshape(_G2 * f2, 1).astype(jnp.float32)
    b3t = jnp.tile(b3, _G3).reshape(_G3 * r2, 1).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, n=n, nb=nb, tb=tb, h=h, width=width, wp=wp, f1=f1, f2=f2,
        r2=r2, cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n * hp * r2, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb + 16, wp), jnp.float32),  # input slab (+zero pad)
            pltpu.VMEM(((tb + 8) * f1, wp), cdt),    # out1 buffer
            pltpu.VMEM(((tb + 4) * f2, wp), cdt),    # out2 buffer
            pltpu.VMEM((tb * r2, wp), jnp.float32),  # output staging
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1m, *w2m, *w3m, b1t, b2t, b3t)

    # rows are ((ni, hi, t) row, (i, j) plane): (n, nb, tb, r, r, wp)
    out = out.reshape(n, nb, tb, r, r, wp)[..., :width]
    out = jnp.transpose(out, (0, 1, 2, 3, 5, 4))  # (n, nb, tb, i, W, j)
    out = out.reshape(n, hp * r, width * r, 1)
    return out[:, : h * r]
