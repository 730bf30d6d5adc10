"""On-device PSNR / SSIM with the SISR border-shave protocol (K4 in SURVEY §2b).

Protocol, pinned here once (SURVEY.md §7 "Y-channel protocol details"):

* Scores are computed on the **Y channel** (BT.601 studio swing, see
  ``ops/color.py``) of images in ``[0, 1]``.
* A border of ``scale`` pixels is shaved from every side before scoring —
  the convention of SRCNN/VDSR/ESPCN eval code.
* ``quantize=True`` snaps both images to the uint8 grid
  (``round(x*255)/255``) first, matching scoring against saved 8-bit PNGs;
  papers' tables are quantized, so eval uses it; training monitors may not.
* PSNR uses peak 1.0: ``10 log10(1 / MSE)`` — identical in dB to the
  255-scale form.

The reference computed PSNR host-side with numpy after pulling SR frames off
device (SURVEY §3.2); here both metrics are pure jnp so eval never ships
full-resolution frames to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["shave", "quantize_u8", "psnr", "ssim"]


def shave(x: jnp.ndarray, border: int) -> jnp.ndarray:
    """Remove ``border`` pixels from each spatial edge of ``(..., H, W, C)``."""
    if border == 0:
        return x
    return x[..., border:-border, border:-border, :]


def quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Snap [0,1] floats onto the uint8 grid (round-half-away like numpy/PIL save)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def psnr(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    border: int = 0,
    quantize: bool = True,
) -> jnp.ndarray:
    """PSNR (dB) over the trailing ``(H, W, C)`` dims; leading dims broadcast.

    Returns shape ``pred.shape[:-3]`` — per-image PSNR for batched input.
    """
    pred = shave(pred, border).astype(jnp.float32)
    target = shave(target, border).astype(jnp.float32)
    if quantize:
        pred, target = quantize_u8(pred), quantize_u8(target)
    mse = jnp.mean(jnp.square(pred - target), axis=(-3, -2, -1))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2_sep(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian filter over (N, H, W, C), depthwise.

    HIGHEST precision is mandatory: at TPU-default precision these f32 convs
    round through bf16 and the ``E[x²] − E[x]²`` variance terms cancel badly
    enough to push SSIM above 1.0 (observed on v5e).  Metric code is not a
    hot path; full-f32 passes are free here.
    """
    c = x.shape[-1]
    size = win.shape[0]
    # rows then cols, depthwise via feature_group_count=C
    k_row = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, c))
    k_col = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, k_row.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, k_row, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, k_col.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k_col, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    border: int = 0,
    quantize: bool = True,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM (Wang et al. 2004 constants) over trailing ``(H, W, C)``.

    Gaussian 11x11 sigma=1.5 window, 'valid' padding — the configuration the
    SRGAN paper's SSIM tables use (arXiv:1609.04802 Table 2).
    """
    dt = jnp.promote_types(pred.dtype, jnp.float32)
    pred = shave(pred, border).astype(dt)
    target = shave(target, border).astype(dt)
    if quantize:
        pred, target = quantize_u8(pred), quantize_u8(target)

    lead = pred.shape[:-3]
    x = pred.reshape((-1,) + pred.shape[-3:])
    y = target.reshape((-1,) + target.shape[-3:])

    win = _gaussian_window(win_size, sigma).astype(dt)
    mu_x = _filter2_sep(x, win)
    mu_y = _filter2_sep(y, win)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _filter2_sep(x * x, win) - mu_x2
    sigma_y2 = _filter2_sep(y * y, win) - mu_y2
    sigma_xy = _filter2_sep(x * y, win) - mu_xy

    c1, c2 = k1 * k1, k2 * k2  # peak = 1.0
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3)).reshape(lead)
