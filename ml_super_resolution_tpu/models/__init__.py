"""Model zoo: SRCNN / ESPCN / VDSR / SRResNet / SRGAN (SURVEY §2b M1–M4).

One registry keyed by model name replaces the reference's per-paper scripts
(SURVEY §1a L5).  All models are flax.linen modules in NHWC with pure apply
functions — the idiomatic layout for pjit/shard_map on TPU.
"""

from __future__ import annotations

from typing import Any, Callable

from ml_super_resolution_tpu.models.srcnn import SRCNN
from ml_super_resolution_tpu.models.espcn import ESPCN
from ml_super_resolution_tpu.models.vdsr import VDSR
from ml_super_resolution_tpu.models.edsr import EDSR
from ml_super_resolution_tpu.models.srresnet import SRResNet, SRGANDiscriminator
from ml_super_resolution_tpu.models.vgg import VGG19Features, load_vgg19_params
from ml_super_resolution_tpu.utils.config import ModelConfig

__all__ = [
    "SRCNN",
    "ESPCN",
    "VDSR",
    "SRResNet",
    "SRGANDiscriminator",
    "EDSR",
    "build_model",
    "MODEL_SPECS",
    "register_model",
]


# name -> (constructor, lr_space, y_only_default, receptive_field_radius_fn)
# lr_space: network consumes LR-resolution input (vs bicubic-pre-upscaled).
# rf_radius(scale): receptive-field radius in *input* pixels — the halo width
# tiled inference must exchange (SURVEY §5.7).
MODEL_SPECS: dict[str, dict[str, Any]] = {}


def register_model(
    name: str,
    ctor: Callable[..., Any],
    lr_space: bool,
    y_only: bool,
    rf_radius: Callable[[int], int],
) -> None:
    MODEL_SPECS[name] = dict(
        ctor=ctor, lr_space=lr_space, y_only=y_only, rf_radius=rf_radius
    )


# SRCNN 9-5-5: radius = (9+5+5-3)/2 = 8 px, HR space.
register_model("srcnn", SRCNN, lr_space=False, y_only=True, rf_radius=lambda s: 8)
# ESPCN 5-3-3: radius = (5+3+3-3)/2 = 4 px, LR space.
register_model("espcn", ESPCN, lr_space=True, y_only=True, rf_radius=lambda s: 4)
# VDSR: 20 3x3 convs -> radius 20 px, HR space.
register_model("vdsr", VDSR, lr_space=False, y_only=True, rf_radius=lambda s: 20)
# SRResNet B=16: 9x9 head (4) + 16 blocks * 2 convs (32) + mid conv (1)
# + 2 upsample convs (2 in growing space ~ counted in LR) + 9x9 tail in HR.
# Conservative LR-space radius: 4 + 33 + 2 + ceil(4/scale) + 1.
register_model(
    "srresnet",
    SRResNet,
    lr_space=True,
    y_only=False,
    rf_radius=lambda s: 41,
)
# EDSR-baseline: 3x3 head (1) + 16 blocks * 2 convs (32) + mid conv (1)
# + upsample convs (2) + 3x3 HR tail (~1 in LR) — conservative LR radius 37.
register_model("edsr", EDSR, lr_space=True, y_only=False, rf_radius=lambda s: 37)
# 'srgan' is SRResNet weights trained with the adversarial recipe — same net.
register_model(
    "srgan",
    SRResNet,
    lr_space=True,
    y_only=False,
    rf_radius=lambda s: 41,
)


def build_model(cfg: ModelConfig):
    """Instantiate a model from config; ``cfg.overrides`` feed the constructor."""
    spec = MODEL_SPECS[cfg.name]
    kwargs = dict(cfg.overrides)
    if cfg.name in ("espcn", "srresnet", "srgan", "edsr"):
        kwargs.setdefault("scale", cfg.scale)
    kwargs.setdefault("channels", cfg.channels)
    return spec["ctor"](**kwargs)


def model_spec(name: str) -> dict[str, Any]:
    return MODEL_SPECS[name]
