"""Sub-pixel convolution rearrangement (depth-to-space) — ESPCN's core op.

ESPCN (arXiv:1609.05158) keeps all convolutions in LR space and produces
``r^2 * C`` channels which are rearranged into an ``(rH, rW, C)`` image.  The
reference implemented this with TensorFlow's ``tf.depth_to_space``
(BASELINE.json:8 "sub-pixel depth-to-space upsampler"); we pin the identical
NHWC channel ordering so trained weights mean the same thing:

    out[b, h*r + i, w*r + j, c] = in[b, h, w, (i*r + j)*C + c]

Pure reshape/transpose — XLA lowers this to a layout change that fuses into
the producing conv.  A Pallas fused conv+shuffle epilogue lives in
``kernels/`` for the cases where XLA's layout choice loses (K1 in SURVEY §2b).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """``(..., H, W, r^2*C) -> (..., r*H, r*W, C)``, tf.depth_to_space order."""
    *lead, h, w, c = x.shape
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by r^2={r * r}")
    c_out = c // (r * r)
    x = x.reshape(*lead, h, w, r, r, c_out)
    # (..., h, w, i, j, c) -> (..., h, i, w, j, c)
    x = jnp.swapaxes(x, -4, -3)
    return x.reshape(*lead, h * r, w * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle`: ``(..., rH, rW, C) -> (..., H, W, r^2*C)``."""
    *lead, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError(f"spatial dims ({hr},{wr}) not divisible by r={r}")
    h, w = hr // r, wr // r
    x = x.reshape(*lead, h, r, w, r, c)
    x = jnp.swapaxes(x, -4, -3)
    return x.reshape(*lead, h, w, r * r * c)
