"""Pallas-routed inference forwards for the model zoo (SURVEY §2b K1/K2).

``sr upscale --pallas`` must change the executed kernels for *every* model,
not just ESPCN: these functions re-express each model's inference forward
directly over its checkpointed param tree, swapping the fusible stages for
the Pallas kernels —

* VDSR      -> K2 ``conv_residual_add``: the final 3x3 conv + global
               residual add is one VMEM-resident pass (one HBM write).
* SRResNet/ -> K1 ``conv_pixel_shuffle``: each sub-pixel upsample stage's
  SRGAN        conv + depth-to-space runs fused (the conv output is never
               materialized in HBM at LR resolution x r^2 channels).
* ESPCN     -> whole-net fused kernel (``espcn_fused.py``), routed in
               ``infer.py`` directly.

Everything not fused stays on XLA's conv path (already optimal for big
SAME convs).  Each forward is golden-tested against the flax ``model.apply``
in tests/test_pallas_apply.py — identical math, different executors.
Inference-only: the Pallas kernels define no VJP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ml_super_resolution_tpu.kernels.residual import conv_residual_add
from ml_super_resolution_tpu.kernels.subpixel import conv_pixel_shuffle

__all__ = ["vdsr_pallas_forward", "srresnet_pallas_forward", "pallas_apply_fn"]


def _conv(x, p, stride: int = 1):
    w, b = p["kernel"], p["bias"]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=dn
    )
    return y + b


def _bn(x, p, s, eps: float = 1e-5):
    # flax BatchNorm inference: normalize by running stats, then affine.
    inv = jax.lax.rsqrt(s["var"] + eps)
    return (x - s["mean"]) * inv * p["scale"] + p["bias"]


def _prelu(x, p):
    return jnp.where(x >= 0, x, p["negative_slope"] * x)


@jax.jit
def vdsr_pallas_forward(params, x):
    """VDSR inference with the K2 fused residual head (models/vdsr.py)."""
    depth = len(params)
    y = x
    for i in range(depth - 1):
        y = jax.nn.relu(_conv(y, params[f"Conv_{i}"]))
    last = params[f"Conv_{depth - 1}"]
    return conv_residual_add(y, x, last["kernel"], last["bias"]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("scale",))
def srresnet_pallas_forward(params, batch_stats, x, scale: int):
    """SRResNet/SRGAN inference with K1 fused sub-pixel stages
    (models/srresnet.py; stage decomposition per _upsample_stages)."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages

    use_bn = "BatchNorm_0" in params
    head = _prelu(_conv(x, params["Conv_0"]), params["PReLU_0"])
    y = head
    nblocks = sum(1 for k in params if k.startswith("_ResBlock_"))
    for i in range(nblocks):
        bp = params[f"_ResBlock_{i}"]
        bs = batch_stats.get(f"_ResBlock_{i}", {}) if use_bn else {}
        z = _conv(y, bp["Conv_0"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_0"], bs["BatchNorm_0"])
        z = _prelu(z, bp["PReLU_0"])
        z = _conv(z, bp["Conv_1"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_1"], bs["BatchNorm_1"])
        y = y + z
    y = _conv(y, params["Conv_1"])
    if use_bn:
        y = _bn(y, params["BatchNorm_0"], batch_stats["BatchNorm_0"])
    y = y + head  # long skip
    for j, r in enumerate(_upsample_stages(scale)):
        sub = params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"]
        y = conv_pixel_shuffle(y, sub["kernel"], sub["bias"], r)
        y = _prelu(y, params[f"PReLU_{j + 1}"])
    y = _conv(y, params["Conv_2"])
    return y.astype(jnp.float32)


def pallas_apply_fn(model_name: str, variables, scale: int):
    """The ``--pallas`` routing used by infer.py; None = no fused path."""
    if model_name == "vdsr":
        params = variables["params"]
        import os

        if (
            os.environ.get("SR_VDSR_FUSED") == "1"
            and params["Conv_0"]["kernel"].shape[2] == 1
        ):
            # Whole-net multi-layer fused kernel (kernels/vdsr_fused.py):
            # golden-tested in interpret mode, but its Mosaic compile on the
            # current remote-attach path exceeds 25 minutes (measured twice,
            # never completed within budget), so it is OPT-IN via
            # SR_VDSR_FUSED=1 rather than the default route.
            from ml_super_resolution_tpu.kernels.vdsr_fused import (
                vdsr_fused_forward,
            )

            return lambda inp: vdsr_fused_forward(params, inp)
        # Default: K2 fused residual head (on-device validated, fast compile).
        return lambda inp: vdsr_pallas_forward(params, inp)
    if model_name in ("srresnet", "srgan"):
        return lambda inp: srresnet_pallas_forward(
            variables["params"], variables.get("batch_stats", {}), inp, scale
        )
    return None
