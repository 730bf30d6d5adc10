"""EDSR: Enhanced Deep Super-Resolution (Lim et al., arXiv:1707.02921).

The NTIRE-2017 winner and the natural "deeper SRResNet" the zoo was built
to host: SRResNet's residual trunk with every BatchNorm removed (BN costs
memory/compute and hurts SR — paper §3.1), ReLU-only blocks with a
residual-scaling constant (paper §3.1: stabilizes wide variants), 3x3
head/tail convs instead of 9x9, and a mean-shift so the trunk sees
zero-centered signal.  "EDSR-baseline" = 16 blocks x 64 features,
res_scale 1.0; the full paper model = 32 blocks x 256 features,
res_scale 0.1 — both reachable via ``ModelConfig.overrides``.

TPU notes: NHWC, bf16-able trunk with f32 output; upsampling is the same
ICNR sub-pixel stage used zoo-wide (checkerboard-free from init; shares
the pixel-shuffle contract with ``kernels/subpixel.py``); no BN means no
``batch_stats`` collection, so train and eval trace identically — one
jitted program, and the fused res-block is two back-to-back MXU convs
with nothing between them for XLA to break fusion on.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ml_super_resolution_tpu.models.common import ICNRConvPixelShuffle
from ml_super_resolution_tpu.models.srresnet import _upsample_stages


class _EDSRBlock(nn.Module):
    features: int
    res_scale: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(y)
        if self.res_scale != 1.0:
            y = y * jnp.asarray(self.res_scale, y.dtype)
        return x + y


class EDSR(nn.Module):
    scale: int = 4
    channels: int = 3
    features: int = 64
    num_blocks: int = 16
    res_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Mean-shift (paper pre/post MeanShift layers): inputs are [0,1]
        # floats zoo-wide, so the dataset-mean subtraction becomes a 0.5
        # centering constant — same role, no dataset-specific buffer.
        x = x - jnp.asarray(0.5, x.dtype)
        head = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        y = head
        for _ in range(self.num_blocks):
            y = _EDSRBlock(self.features, self.res_scale, self.dtype)(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = y + head  # long skip
        for r in _upsample_stages(self.scale):
            # paper: no activation inside the upsample stages
            y = ICNRConvPixelShuffle(self.features, r, kernel=3, dtype=self.dtype)(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        return (y + jnp.asarray(0.5, y.dtype)).astype(jnp.float32)
