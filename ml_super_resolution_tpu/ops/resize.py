"""Matlab-``imresize``-convention bicubic resampling as MXU matmuls.

Why this exists (SURVEY.md §7 "hard parts"): PIL, OpenCV, ``jax.image.resize``
and Matlab ``imresize`` all disagree on bicubic details (antialias on
downsample, kernel ``a``, edge handling).  The SISR literature's LR images and
PSNR tables assume **Matlab imresize**: Keys cubic kernel with ``a = -0.5``,
antialiasing on downscale (kernel stretched by the scale factor), replicated
edges, weights renormalized to sum to 1.  The reference repo performed this
degradation host-side with scipy/PIL per batch (BASELINE.json:5
"bicubic-downsample ... host-side numpy loop"); getting within 0.05 dB of the
protocol requires pinning the Matlab convention exactly, once, here.

TPU-native realization: resampling along one axis with a fixed in/out size is
a *linear map*, so we precompute a dense ``(out, in)`` weight matrix on the
host (numpy, cached) and apply it as two einsums (rows, then columns).  Dense
resize matrices turn the whole op into MXU work — no gathers, no dynamic
shapes, fuses freely with surrounding XLA — and for image-sized axes the
extra FLOPs vs a 4-tap gather are noise on a v5e.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["cubic_kernel", "resize_kernel_matrix", "imresize"]


def cubic_kernel(x: np.ndarray) -> np.ndarray:
    """Keys bicubic kernel with a = -0.5 (the Matlab/'catmull-rom' cubic)."""
    x = np.abs(x.astype(np.float64))
    x2 = x * x
    x3 = x2 * x
    return np.where(
        x <= 1.0,
        1.5 * x3 - 2.5 * x2 + 1.0,
        np.where(x <= 2.0, -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0, 0.0),
    )


@functools.lru_cache(maxsize=256)
def resize_kernel_matrix(
    in_size: int, out_size: int, antialias: bool = True
) -> np.ndarray:
    """Dense ``(out_size, in_size)`` Matlab-imresize bicubic resampling matrix.

    Matches Matlab's ``imresize`` contributions exactly: output sample ``i``
    (0-based) draws from continuous input coordinate
    ``u = (i + 0.5) / s - 0.5`` with ``s = out/in``; on downscale with
    ``antialias`` the kernel is dilated to ``h(x) = s * k(s x)``; source
    indices are clamped to the edge (replication) and each row is
    renormalized to sum to one.
    """
    s = out_size / in_size
    kernel_width = 4.0
    if s < 1.0 and antialias:
        kernel_width /= s

    # 0-based continuous source coordinate of each output sample.
    u = (np.arange(out_size, dtype=np.float64) + 0.5) / s - 0.5
    left = np.floor(u - kernel_width / 2.0).astype(np.int64)
    p = int(np.ceil(kernel_width)) + 2
    # (out, p) source index window and kernel argument.
    idx = left[:, None] + np.arange(p, dtype=np.int64)[None, :]
    dist = u[:, None] - idx.astype(np.float64)
    if s < 1.0 and antialias:
        weights = s * cubic_kernel(s * dist)
    else:
        weights = cubic_kernel(dist)
    weights /= np.sum(weights, axis=1, keepdims=True)

    # Replicated edges: clamp indices, accumulate (scatter-add) into dense.
    idx = np.clip(idx, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), p), idx.reshape(-1)), weights.reshape(-1))
    return mat


def _out_size(in_size: int, scale: float) -> int:
    # Matlab: output size = ceil(in * scale).
    return int(np.ceil(in_size * scale - 1e-9))


def imresize(
    image: jnp.ndarray,
    scale: float | None = None,
    out_shape: tuple[int, int] | None = None,
    antialias: bool = True,
    precision="highest",
) -> jnp.ndarray:
    """Matlab-convention bicubic resize of ``(..., H, W, C)`` images.

    Exactly one of ``scale`` / ``out_shape`` must be given.  ``antialias``
    only affects downscaling (Matlab default: on).  Runs as two dense
    einsums — batched MXU matmuls under jit.  Weights are computed in f64 on
    the host and cast to ``image.dtype``'s compute precision (f32 minimum) so
    bf16 activations still resample through f32 accumulation.

    ``precision`` defaults to HIGHEST: on TPU, f32 matmuls at default
    precision round operands through bf16 passes, which costs ~0.002 relative
    error — enough to corrupt the bicubic protocol the PSNR gate depends on.
    The degradation path is a tiny fraction of step FLOPs, so full-f32 MXU
    passes here are free in practice.
    """
    if (scale is None) == (out_shape is None):
        raise ValueError("pass exactly one of scale / out_shape")
    h, w = int(image.shape[-3]), int(image.shape[-2])
    if out_shape is None:
        out_shape = (_out_size(h, scale), _out_size(w, scale))
    oh, ow = out_shape

    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)
    x = image.astype(compute_dtype)
    if oh != h:
        mh = jnp.asarray(resize_kernel_matrix(h, oh, antialias), dtype=compute_dtype)
        x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=precision)
    if ow != w:
        mw = jnp.asarray(resize_kernel_matrix(w, ow, antialias), dtype=compute_dtype)
        x = jnp.einsum("ow,...hwc->...hoc", mw, x, precision=precision)
    return x.astype(image.dtype) if image.dtype == jnp.float64 else x
