"""Parallelism: device meshes, DP sharding, spatial tiling + halo exchange.

SURVEY §2b P1–P3.  The reference is single-process single-device (SURVEY §2a
"Parallelism strategies: none"); these components exist because the
capability target (BASELINE.json:5,11) requires DP training over ICI and
tiled full-frame inference with halo-exchanged patch shards.
"""

from ml_super_resolution_tpu.parallel.mesh import make_mesh  # noqa: F401
from ml_super_resolution_tpu.parallel.tiling import (  # noqa: F401
    tiled_apply,
    tiled_upscale,
)
