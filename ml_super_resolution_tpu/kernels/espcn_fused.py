"""Fully-fused ESPCN inference kernel: 3 conv layers + sub-pixel rows in VMEM.

The flagship throughput path (BASELINE.json:5 headline metric).  Under XLA,
ESPCN's inter-layer activations (64 then 32 channels at LR resolution) make
two HBM round trips and the tiny channel counts leave the MXU underfed
(~11 TF/s effective measured on v5e).  This kernel keeps the whole network
in VMEM per row-block:

* **W-lane layout**: activations live as ``(C, rows, Wp)`` with the padded
  image width on lanes (512 for 480-wide LR frames) — C is too small to be a
  useful lane dim, W is not.  Each conv tap is one
  ``(Cout, Cin) @ (Cin, rows*Wp)`` MXU matmul via ``dot_general`` with a 3D
  rhs (no reshapes — Mosaic forbids lane-dim reshapes).
* **Grid-free**: a single program ``fori_loop``s over row blocks with manual
  HBM->VMEM DMA (gridded pallas_call hangs on this TPU attach path; see
  kernels/__init__ notes), double-buffer-ready structure.
* **Sub-pixel epilogue**: channels ``(i*r + j)`` are rearranged to
  ``(rows*r_i*r_j, W)`` with major-dim reshapes + middle transposes only;
  the final ``(w, j)`` lane interleave is one cheap XLA transpose in the
  wrapper (lane merges are unsupported in-kernel).

Golden-tested against the flax ESPCN apply in tests/test_kernels.py.
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


def _pick_tile(h: int, cap: int = 32) -> int:
    for th in range(min(cap, h), 0, -1):
        if h % th == 0:
            return th
    return h


def _kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            xv, ov, sin, sout, *, n, nb, th, width, wp, f1, f2, r):
    r2 = r * r

    def step(k, _):
        ni = k // nb
        hi = k % nb
        # xp is flattened to 2D (n*(h+8), wp): DMA via pl.ds offsets only —
        # traced bare leading indices on HBM refs are a hang risk on this
        # attach path.
        src_row = ni * (nb * th + 8) + hi * th
        cp = pltpu.make_async_copy(xp_ref.at[pl.ds(src_row, th + 8)], xv, sin)
        cp.start()
        cp.wait()

        # conv1 5x5 (1 -> f1) over the (th+4, W+4) halo region, tanh.
        taps = [
            xv[dy : dy + th + 4, dx : dx + width + 4]
            for dy in range(5)
            for dx in range(5)
        ]
        patches = jnp.stack(taps, axis=0)  # (25, th+4, W+4)
        out1 = jax.lax.dot_general(
            w1_ref[:], patches,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (f1, th+4, W+4)
        out1 = jnp.tanh(out1 + b1_ref[:].reshape(f1, 1, 1))
        # Re-zero halo positions outside the true frame: flax SAME padding
        # gives conv2 literal zeros there, not conv1-of-zeros activations.
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (1, th + 4, 1), 1) + hi * th - 2
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width + 4), 2) - 2
        out1 = jnp.where(
            (rows1 >= 0) & (rows1 < nb * th) & (cols1 >= 0) & (cols1 < width),
            out1,
            0.0,
        )

        # conv2 3x3 (f1 -> f2) over (th+2, W+2), tanh.
        acc2 = b2_ref[:].reshape(f2, 1, 1) * jnp.ones(
            (f2, th + 2, width + 2), jnp.float32
        )
        for dy in range(3):
            for dx in range(3):
                acc2 += jax.lax.dot_general(
                    w2_ref[dy * 3 + dx],
                    out1[:, dy : dy + th + 2, dx : dx + width + 2],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out2 = jnp.tanh(acc2)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, th + 2, 1), 1) + hi * th - 1
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width + 2), 2) - 1
        out2 = jnp.where(
            (rows2 >= 0) & (rows2 < nb * th) & (cols2 >= 0) & (cols2 < width),
            out2,
            0.0,
        )

        # conv3 3x3 (f2 -> r^2) over (th, W).
        acc3 = b3_ref[:].reshape(r2, 1, 1) * jnp.ones((r2, th, width), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc3 += jax.lax.dot_general(
                    w3_ref[dy * 3 + dx],
                    out2[:, dy : dy + th, dx : dx + width],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        # sub-pixel rows: channel (i*r + j) -> output row ((h*r + i)*r + j).
        t = acc3.reshape(r, r, th, width)          # split major
        t = jnp.transpose(t, (2, 0, 1, 3))         # (th, r_i, r_j, W); lanes fixed
        ov[:, :width] = t.reshape(th * r2, width)  # merge majors
        dst_row = (ni * nb + hi) * th * r2
        cpo = pltpu.make_async_copy(ov, out_ref.at[pl.ds(dst_row, th * r2)], sout)
        cpo.start()
        cpo.wait()
        return 0

    ov[:, :] = jnp.zeros((ov.shape[0], ov.shape[1]), ov.dtype)
    jax.lax.fori_loop(0, n * nb, step, 0)


def espcn_fused_forward(
    weights: dict, x: jnp.ndarray, scale: int, interpret: bool | None = None
) -> jnp.ndarray:
    """Fused ESPCN forward.  x: (N, H, W) or (N, H, W, 1) Y-channel in [0,1].

    Returns (N, r*H, r*W, 1) f32, numerically matching the flax ESPCN apply
    (f32 accumulation throughout).  ``interpret=None`` auto-selects
    interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _espcn_fused_forward(weights, x, scale, interpret)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _espcn_fused_forward(
    weights: dict, x: jnp.ndarray, scale: int, interpret: bool = False
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

    th = _pick_tile(h)
    nb = h // th
    wp = -(-(width + 8) // 128) * 128
    # rows: 4 top halo + 4 bottom halo per frame; flattened to 2D for DMA.
    xp = jnp.zeros((n, h + 8, wp), x.dtype).at[:, 4 : 4 + h, 4 : 4 + width].set(x)
    xp = xp.reshape(n * (h + 8), wp)

    # weight layouts: (f1, 25), (9, f2, f1), (9, r2, f2)
    w1m = jnp.transpose(w1[:, :, 0, :], (2, 0, 1)).reshape(f1, 25)
    w2m = jnp.transpose(w2, (0, 1, 3, 2)).reshape(9, f2, f1)
    w3m = jnp.transpose(w3, (0, 1, 3, 2)).reshape(9, r2, f2)

    kernel = functools.partial(
        _kernel, n=n, nb=nb, th=th, width=width, wp=wp, f1=f1, f2=f2, r=r
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
        out_shape=jax.ShapeDtypeStruct((n * h * r2, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 8, wp), x.dtype),
            pltpu.VMEM((th * r2, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1m, b1, w2m, b2, w3m, b3)

    # final lane interleave in XLA: (N*rH*r, Wp) -> (N, rH, W*r, 1)
    out = out.reshape(n, h * r, r, wp)[:, :, :, :width]
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(n, h * r, width * r, 1)
    return out
