"""ml_super_resolution_tpu — a TPU-native single-image super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the public
``imironhead/ml_super_resolution`` model zoo (SRCNN, ESPCN, VDSR,
SRGAN/SRResNet + tiled full-frame inference).  The reference mount at
``/root/reference`` was empty at survey and build time (see ``SURVEY.md`` §0),
so capability parity is anchored on the driver metadata (``BASELINE.json``)
and the original papers:

* SRCNN   — arXiv:1501.00092
* ESPCN   — arXiv:1609.05158
* VDSR    — arXiv:1511.04587
* SRGAN   — arXiv:1609.04802

Design principles (TPU-first, not a port):

* NHWC layout everywhere (channels on lanes).
* All per-step compute — augmentation, bicubic degradation, YCbCr transform,
  forward, backward, optimizer update, metrics — lives inside one jitted XLA
  program; the host only decodes images.
* Data parallelism via ``jax.sharding`` over a ``Mesh``; spatial (context)
  parallelism for full-frame inference via ``shard_map`` + ``ppermute`` halo
  exchange.
* Hot ops (sub-pixel upsampling epilogue, fused preprocessing) have Pallas
  TPU kernels with pure-XLA fallbacks.
"""

__version__ = "0.1.0"

from ml_super_resolution_tpu.utils.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
)
