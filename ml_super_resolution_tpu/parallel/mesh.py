"""Device mesh construction (the framework's single entry point for topology).

TPU-native communication model (SURVEY §5.8): collectives ride ICI within a
slice; a second mesh axis over slices would ride DCN (via
``jax.distributed.initialize`` — out of scope for SR-sized models but the
mesh API is already shaped for it).  Models never call collectives directly;
they see only mesh axis names:

* ``data``  — batch data parallelism (gradient ``psum`` inserted by XLA)
* ``space`` — spatial tiling of full frames (halo ``ppermute``, P2)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    dp: int | None = None,
    sp: int = 1,
    sw: int = 1,
    devices=None,
) -> Mesh:
    """``(data, space[, space_w])`` mesh over ICI-contiguous device order.

    ``dp=None`` uses all remaining devices after the spatial axes are carved
    out.  ``sw > 1`` adds a second spatial axis for 2D (rows x cols) frame
    tiling (``parallel/tiling.py::tiled_apply_2d``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = max(1, len(devices) // (sp * sw))
    n = dp * sp * sw
    if n > len(devices):
        raise ValueError(
            f"need {n} devices (dp={dp} sp={sp} sw={sw}), have {len(devices)}"
        )
    if sw == 1:
        arr = np.asarray(devices[:n]).reshape(dp, sp)
        return Mesh(arr, ("data", "space"))
    arr = np.asarray(devices[:n]).reshape(dp, sp, sw)
    return Mesh(arr, ("data", "space", "space_w"))
