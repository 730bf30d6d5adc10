"""Host-side data layer: decode only — every per-step transform is on device.

Layer L2 of SURVEY §1b.  The reference's pipeline did crop/bicubic/YCbCr on
the host per step (BASELINE.json:5); here the host's entire job is turning
files into fixed-size uint8 HR tiles that stream to HBM, and
``ops/patches.py`` does the rest inside the jitted step.
"""

from ml_super_resolution_tpu.data.datasets import (  # noqa: F401
    ImageFolder,
    SyntheticImages,
    load_eval_images,
)
from ml_super_resolution_tpu.data.loader import TileLoader  # noqa: F401
