"""Pallas TPU kernels (K1–K3 of SURVEY §2b) with XLA fallbacks.

The reference leaned on cuDNN for conv / depth_to_space and on host numpy
for preprocessing (SURVEY §2a "native components"); the TPU-native
equivalents are Mosaic kernels.  Every kernel here:

* has a pure-XLA reference implementation it is golden-tested against,
* is opt-in via ``use_pallas=`` flags (defaults stay on XLA until the kernel
  wins on the target chip),
* runs in interpreter mode on CPU for CI.
"""

from ml_super_resolution_tpu.kernels.subpixel import (  # noqa: F401
    conv_pixel_shuffle,
    conv_pixel_shuffle_reference,
)
from ml_super_resolution_tpu.kernels.residual import (  # noqa: F401
    conv_residual_add,
    conv_residual_add_reference,
)
from ml_super_resolution_tpu.kernels.preprocess import (  # noqa: F401
    preprocess_pairs,
    preprocess_pairs_reference,
)
from ml_super_resolution_tpu.kernels.espcn_fused import (  # noqa: F401
    espcn_fused_forward,
    extract_espcn_weights,
)
