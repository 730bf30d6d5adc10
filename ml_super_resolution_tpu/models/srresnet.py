"""SRResNet generator + SRGAN discriminator.

Paper: Ledig et al., arXiv:1609.04802.  Capability pinned by BASELINE.json:10
("SRGAN generator (SRResNet) + VGG perceptual loss, ×4 on DIV2K").

Generator (paper Fig. 4): 9x9x64 conv + PReLU head; B=16 residual blocks
[3x3x64 conv, BN, PReLU, 3x3x64 conv, BN, +skip]; 3x3x64 conv + BN with a
long skip from the head; ×4 upsampling as two ×2 sub-pixel stages
[3x3x256 conv, pixel-shuffle ×2, PReLU]; 9x9xC tail.  'SRGAN' is the same
network trained with the adversarial + VGG perceptual recipe (train/gan.py).

TPU notes: NHWC, bf16-able trunk with f32 output; sub-pixel stages use ICNR
init (arXiv:1707.02937) so both MSE and adversarial phases start
checkerboard-free; BatchNorm state lives in the standard flax
``batch_stats`` collection.

Discriminator (paper Fig. 4 bottom): 3x3x64 stride-1 + LeakyReLU(0.2), then
seven conv-BN-LeakyReLU blocks doubling width to 512 with alternating
stride 2, dense 1024 + LeakyReLU, dense 1 logit (sigmoid lives in the loss).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ml_super_resolution_tpu.models.common import ICNRConvPixelShuffle


class _ResBlock(nn.Module):
    features: int
    use_bn: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.PReLU()(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(y)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return x + y


def _upsample_stages(scale: int) -> Sequence[int]:
    """Decompose scale into sub-pixel stage factors (paper uses 2+2 for x4)."""
    if scale == 1:
        return ()
    if scale == 2:
        return (2,)
    if scale == 3:
        return (3,)
    if scale == 4:
        return (2, 2)
    if scale == 8:
        return (2, 2, 2)
    raise ValueError(f"unsupported scale {scale}")


class SRResNet(nn.Module):
    scale: int = 4
    channels: int = 3
    features: int = 64
    num_blocks: int = 16
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        head = nn.Conv(self.features, (9, 9), padding="SAME", dtype=self.dtype)(x)
        head = nn.PReLU()(head)
        y = head
        for _ in range(self.num_blocks):
            y = _ResBlock(self.features, self.use_bn, self.dtype)(y, train)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(y)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = y + head  # long skip
        for r in _upsample_stages(self.scale):
            y = ICNRConvPixelShuffle(self.features, r, kernel=3, dtype=self.dtype)(y)
            y = nn.PReLU()(y)
        y = nn.Conv(self.channels, (9, 9), padding="SAME", dtype=self.dtype)(y)
        return y.astype(jnp.float32)


class SRGANDiscriminator(nn.Module):
    """Patch discriminator over HR images (logit output, BCE-with-logits loss)."""

    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        y = lrelu(y)
        spec = [  # (features, stride) — paper Fig. 4
            (self.features, 2),
            (self.features * 2, 1),
            (self.features * 2, 2),
            (self.features * 4, 1),
            (self.features * 4, 2),
            (self.features * 8, 1),
            (self.features * 8, 2),
        ]
        for feats, stride in spec:
            y = nn.Conv(
                feats, (3, 3), strides=(stride, stride), padding="SAME", dtype=self.dtype
            )(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
            y = lrelu(y)
        y = y.reshape(y.shape[0], -1)
        y = nn.Dense(1024, dtype=self.dtype)(y)
        y = lrelu(y)
        y = nn.Dense(1, dtype=self.dtype)(y)
        return y.astype(jnp.float32)
