"""Core numerics: color conversion, resampling, sub-pixel ops, metrics.

These are the pinned-convention primitives everything else builds on — the
SISR evaluation protocol (Matlab-imresize bicubic, BT.601 studio-swing YCbCr,
Y-channel PSNR with a ``scale``-pixel border shave) lives here and *only*
here, per SURVEY.md §7 "hard parts".
"""

from ml_super_resolution_tpu.ops.color import (  # noqa: F401
    rgb_to_ycbcr,
    rgb_to_y,
    ycbcr_to_rgb,
)
from ml_super_resolution_tpu.ops.resize import imresize, resize_kernel_matrix  # noqa: F401
from ml_super_resolution_tpu.ops.pixel_shuffle import (  # noqa: F401
    pixel_shuffle,
    pixel_unshuffle,
)
from ml_super_resolution_tpu.ops.metrics import psnr, ssim, shave  # noqa: F401
