"""ESPCN — Real-Time SISR with an Efficient Sub-Pixel Convolutional Network.

Paper: Shi et al., arXiv:1609.05158 (also PAPERS.md:9).  Capability pinned by
BASELINE.json:8 ("ESPCN with sub-pixel depth-to-space upsampler, ×3 on Set14").

All convs run in **LR space** (that is the paper's efficiency claim): 5x5x64
tanh -> 3x3x32 tanh -> 3x3x(r^2*C) -> pixel shuffle to HR.  The final conv
uses ICNR init (arXiv:1707.02937) so the sub-pixel head starts
checkerboard-free — a quality upgrade over the 2016 recipe at zero cost.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ml_super_resolution_tpu.models.common import ICNRConvPixelShuffle


class ESPCN(nn.Module):
    scale: int = 3
    channels: int = 1
    f1: int = 64
    f2: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.f1, (5, 5), padding="SAME", dtype=self.dtype)(x)
        y = nn.tanh(y)
        y = nn.Conv(self.f2, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = nn.tanh(y)
        y = ICNRConvPixelShuffle(
            self.channels, self.scale, kernel=3, dtype=self.dtype
        )(y)
        return y.astype(jnp.float32)
