"""Shared building blocks for the SR model zoo.

All modules are NHWC (channels on TPU lanes); convolutions use SAME padding so
full frames of any size flow through — the classic papers' VALID-padding crop
is replaced by the metric-side border shave (``ops/metrics.py``), the standard
modern protocol.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Conv", "ICNRConvPixelShuffle", "icnr_init"]


def Conv(features: int, kernel: int, **kw) -> nn.Conv:
    """3x3/5x5/9x9 SAME conv, NHWC, f32 params; dtype set per-call for bf16."""
    return nn.Conv(features, (kernel, kernel), padding="SAME", **kw)


def icnr_init(base_init: Callable, scale: int) -> Callable:
    """ICNR initializer (arXiv:1707.02937, PAPERS.md:8): initialize the
    ``r^2*C``-channel sub-pixel conv so all r^2 sub-positions start identical,
    eliminating checkerboard artifacts from random init.

    HWIO kernel layout: output channel ``(i*r+j)*C + c`` (the pixel-shuffle
    contract in ``ops/pixel_shuffle.py``) gets the value of a base kernel for
    channel ``c``, repeated over the r^2 sub-pixel positions.
    """

    r2 = scale * scale

    def init(key, shape, dtype=jnp.float32):
        h, w, cin, cout = shape
        if cout % r2 != 0:
            return base_init(key, shape, dtype)
        base = base_init(key, (h, w, cin, cout // r2), dtype)
        # (h, w, cin, c) -> (h, w, cin, r2, c) -> (h, w, cin, r2*c)
        rep = jnp.repeat(base[..., None, :], r2, axis=-2)
        return rep.reshape(h, w, cin, cout)

    return init


class ICNRConvPixelShuffle(nn.Module):
    """Conv producing r^2*C channels + pixel shuffle, ICNR-initialized (K1).

    The XLA path of SURVEY §2b K1; the Pallas fused epilogue in
    ``kernels/subpixel.py`` is numerically identical and swaps in behind the
    ``use_pallas`` flag at inference.
    """

    out_channels: int
    scale: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        conv = nn.Conv(
            self.out_channels * self.scale * self.scale,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=icnr_init(nn.initializers.he_normal(), self.scale),
            dtype=self.dtype,
        )
        return pixel_shuffle(conv(x), self.scale)
