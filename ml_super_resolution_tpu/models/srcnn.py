"""SRCNN — Image Super-Resolution Using Deep Convolutional Networks.

Paper: Dong et al., arXiv:1501.00092.  Capability pinned by BASELINE.json:7
("SRCNN 9-5-5 (3-layer conv) ×2 upscale on Set5, Y-channel, CPU-runnable").

Architecture (the paper's 9-5-5 variant): the input is the **bicubic
pre-upscaled** Y channel at HR resolution; three convs 9x9x64 -> 5x5x32 ->
5x5xC with ReLU on the first two.  ~8K (64*81 + 32*25*64... ) ≈ 57K params.

Deviation from the 2014 recipe, on purpose: SAME padding instead of VALID
(full-frame friendly; quality scored with the protocol border shave), Adam
instead of per-layer SGD learning rates.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SRCNN(nn.Module):
    channels: int = 1
    f1: int = 64
    f2: int = 32
    k1: int = 9
    k2: int = 5
    k3: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.f1, (self.k1, self.k1), padding="SAME", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.f2, (self.k2, self.k2), padding="SAME", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (self.k3, self.k3), padding="SAME", dtype=self.dtype)(y)
        return y.astype(jnp.float32)
