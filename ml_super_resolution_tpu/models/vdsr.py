"""VDSR — Accurate Image Super-Resolution Using Very Deep Convolutional Networks.

Paper: Kim et al., arXiv:1511.04587.  Capability pinned by BASELINE.json:9
("VDSR 20-layer residual net, multi-scale ×2/×3/×4 on BSD100").

Architecture: input is the bicubic pre-upscaled Y channel; 20 3x3 convs
(C->64, 18x 64->64, 64->C), ReLU between, and **global residual learning** —
the net predicts the HR−bicubic residual, added back at the output
(paper §3.2).  One multi-scale model covers ×2/×3/×4 jointly (paper §4.2):
the trainer simply mixes scales in the batch; the network is scale-blind.
Training protocol: high LR with gradient clipping (TrainConfig.grad_clip_norm).

~665K params at depth 20 / width 64 (the §4 sanity-check number).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class VDSR(nn.Module):
    channels: int = 1
    depth: int = 20
    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        he = nn.initializers.he_normal()
        y = x
        for i in range(self.depth - 1):
            y = nn.Conv(
                self.features, (3, 3), padding="SAME", kernel_init=he, dtype=self.dtype
            )(y)
            y = nn.relu(y)
        residual = nn.Conv(
            self.channels, (3, 3), padding="SAME", kernel_init=he, dtype=self.dtype
        )(y)
        # Global residual: network learns HR - bicubic (fused add; K2's XLA path).
        return (x + residual).astype(jnp.float32)
