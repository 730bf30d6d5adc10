"""BT.601 studio-swing RGB <-> YCbCr conversion (the SISR protocol matrices).

Convention (pinned once, used everywhere — SURVEY.md §7 "Y-channel protocol"):

* Images are floating point, range ``[0, 1]``, channel-last (``..., 3``).
* The transform is ITU-R BT.601 *studio swing* ("Matlab ``rgb2ycbcr``"):
  for input in ``[0, 1]``, luma lands in ``[16/255, 235/255]`` and chroma in
  ``[16/255, 240/255]``.  This is the matrix every classic SR paper's eval
  code uses (SRCNN arXiv:1501.00092, VDSR arXiv:1511.04587 evaluate PSNR on
  this Y channel).

The reference repo performs the same conversion host-side with numpy
(BASELINE.json:5 "YCbCr-conversion data path"); here it is a jitted
device-side op so it can fuse into the training step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Matlab rgb2ycbcr coefficients for unit-range input: offset + M @ rgb.
# Rows: Y, Cb, Cr.  Columns: R, G, B.  Units: /255.
_RGB2YCBCR = (
    (65.481, 128.553, 24.966),
    (-37.797, -74.203, 112.0),
    (112.0, -93.786, -18.214),
)
_YCBCR_OFFSET = (16.0, 128.0, 128.0)


def _matrices(dtype):
    m = jnp.asarray(_RGB2YCBCR, dtype=dtype) / 255.0
    off = jnp.asarray(_YCBCR_OFFSET, dtype=dtype) / 255.0
    return m, off


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert ``[..., 3]`` RGB in [0,1] to studio-swing YCbCr in [0,1]."""
    m, off = _matrices(rgb.dtype)
    return rgb @ m.T + off


# Inverse computed once on host in f64 — no device linalg in the hot path.
_YCBCR2RGB = np.linalg.inv(np.asarray(_RGB2YCBCR, dtype=np.float64) / 255.0)


def ycbcr_to_rgb(ycbcr: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_ycbcr` (no clipping — caller decides)."""
    _, off = _matrices(ycbcr.dtype)
    inv = jnp.asarray(_YCBCR2RGB, dtype=ycbcr.dtype)
    return (ycbcr - off) @ inv.T


def rgb_to_y(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma only: ``[..., 3]`` RGB in [0,1] -> ``[..., 1]`` Y in [16/255, 235/255].

    This is the channel the entire SISR PSNR protocol is scored on.
    """
    m, off = _matrices(rgb.dtype)
    y = rgb @ m[0] + off[0]
    return y[..., None]
