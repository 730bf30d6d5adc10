"""Post-training int8 quantization (PTQ) for inference.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 MAC rate, and
int8 activations halve HBM/VMEM traffic — a throughput ceiling the f32/bf16
reference stack (SURVEY §2a: TF1, f32 only) never had.  This module adds a
quantized inference path for the whole model zoo:

* **Weights**: symmetric per-output-channel int8 (``w_q = round(w / s_w)``,
  ``s_w = maxabs / 127`` per output channel).  Symmetric quantization keeps
  zero exact, so SAME-padding semantics are unchanged (padded zeros quantize
  to 0).
* **Activations**: per-layer static scales from a one-shot max-abs
  calibration pass over a representative batch.  Scales are baked into the
  jitted program as scalar constants — no dynamic range computation on the
  hot path.
* **Compute**: each conv runs int8 x int8 with ``preferred_element_type=
  int32`` (MXU-native), then one fused VPU epilogue rescales to float:
  ``y = i32 * (s_x * s_w[c]) + b[c]``.  Nonlinearities, BatchNorm, PReLU and
  residual adds stay in float (tiny VPU work); only conv inputs requantize.

The network structure is written ONCE per model and driven by an engine
object — ``_CalibEngine`` (f32 reference + range recording) or
``_Int8Engine`` (quantized execution) — so calibration and execution can
never disagree about layer order.  EDSR and SRResNet/SRGAN mirror their
*folded-tail* inference recast (kernels/apply.py::edsr_folded_forward /
srresnet_folded_forward): the HR-space tail conv is folded to pre-shuffle
space in f32 first, then the folded kernel is quantized like any other.

Two conv executors, selectable with ``impl``:

* ``"conv"`` — ``lax.conv_general_dilated`` on int8 operands (XLA lowers
  integer convs onto the MXU int8 path on TPU).
* ``"dot"`` — explicit im2col (``conv_general_dilated_patches`` on the int8
  tensor) + one int8 ``dot_general``: a guaranteed-MXU fallback in case a
  given compiler version lowers integer convolution off the systolic array.

Accuracy contract: golden tests (tests/test_quant.py) gate the int8 output
against the f32 forward at >= 40 dB output fidelity on random weights, and
the end-to-end eval path is exposed as ``sr eval --int8`` so trained
checkpoints can report the actual PSNR delta (expected < 0.1 dB for these
well-ranged SR nets).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SUPPORTED",
    "quantize_weight",
    "int8_apply_fn",
    "qat_params",
    "qat_intercept",
]

SUPPORTED = ("srcnn", "espcn", "vdsr", "edsr", "srresnet", "srgan")


# ------------------------------------------------------------------ core --


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8: HWIO kernel -> (w_q, s_w).

    ``s_w`` has shape (C_out,); zero-max channels get scale 1 (all-zero
    kernels quantize to zeros exactly).
    """
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    s = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def _quantize_act(x: jnp.ndarray, sx: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)


def _int8_conv_raw(xq: jnp.ndarray, wq: jnp.ndarray, impl: str) -> jnp.ndarray:
    """int8 NHWC x int8 HWIO -> int32 NHWC, SAME padding, stride 1."""
    if impl == "conv":
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
    # impl == "dot": im2col + one big int8 matmul (MXU-guaranteed).
    kh, kw, cin, cout = wq.shape
    # patches feature dim is channel-major: index = c * (kh*kw) + fh*kw + fw
    pat = jax.lax.conv_general_dilated_patches(
        xq, (kh, kw), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xq.shape, (kh, kw, cin, 1), ("NHWC", "HWIO", "NHWC")))
    wmat = jnp.transpose(wq, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    return jax.lax.dot_general(
        pat, wmat, (((pat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


# ------------------------------------------------- QAT (training-side) --
#
# Quantization-aware fine-tuning: the training forward sees exactly the
# int8 rounding the PTQ inference path will apply — conv kernels
# quantize-dequantize per output channel, conv inputs per tensor — with the
# straight-through estimator (identity gradient through the rounding), so
# the optimizer learns weights that sit well on the int8 grid.  ``sr train
# --qat`` wires this into the trainer loss; eval/checkpoints stay f32 and
# the PTQ path (above) quantizes the fine-tuned weights as usual.


def _fake_quant(x, s):
    q = jnp.clip(jnp.round(x / s), -127, 127) * s
    return x + jax.lax.stop_gradient(q - x)  # STE


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric int8 quantize-dequantize (HWIO)."""
    amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True))
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    return _fake_quant(w, s)


def fake_quant_act(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor symmetric int8 quantize-dequantize (dynamic max-abs —
    the train-time stand-in for PTQ's calibrated static scale)."""
    amax = jax.lax.stop_gradient(jnp.max(jnp.abs(x)))
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    return _fake_quant(x, s)


def qat_params(params):
    """Fake-quantize every 4D conv kernel leaf of a flax param tree (STE:
    gradients flow to the original f32 params)."""

    def fq(path, leaf):
        last = getattr(path[-1], "key", None) if path else None
        if getattr(leaf, "ndim", 0) == 4 and last == "kernel":
            return fake_quant_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fq, params)


def qat_intercept():
    """Context manager fake-quantizing every ``nn.Conv`` input during the
    wrapped ``model.apply`` (flax method interception)."""
    from flax import linen as nn

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, nn.Conv)
                and context.method_name == "__call__"):
            args = (fake_quant_act(args[0]),) + tuple(args[1:])
        return next_fun(*args, **kwargs)

    return nn.intercept_methods(interceptor)


# --------------------------------------------------------------- engines --


class _CalibEngine:
    """f32 reference conv that records per-layer input ranges and quantizes
    weights as the structure visits them (one eager pass, off the hot path).

    ``percentile`` < 100 clips the activation range at that percentile of
    |x| instead of the max — the classic PTQ outlier mitigation.  Measured
    on this zoo's trained checkpoints (v2 eval set, 2026-08-18): it does
    NOT help — SRCNN ×2 is flat (23.941 → 23.945 dB at p99.9, worse
    below) and VDSR ×2 LOSES 0.9 dB at p99.9 (28.500 → 27.594): residual
    nets' activation tails are signal, not outliers.  Max-abs (100)
    therefore stays the default; the knob remains for new model families.
    """

    def __init__(self, percentile: float = 100.0):
        self.percentile = percentile
        self.sx: list[float] = []
        self.wq: list[jnp.ndarray] = []
        self.sw: list[jnp.ndarray] = []
        self.bias: list[jnp.ndarray] = []

    def conv(self, x, p=None, w=None, bias=None):
        w = p["kernel"] if w is None else w
        bias = p["bias"] if bias is None else bias
        ax = jnp.abs(x)
        amax = float(jnp.max(ax) if self.percentile >= 100.0
                     else jnp.percentile(ax, self.percentile))
        self.sx.append(amax / 127.0 if amax > 0 else 1.0)
        wq, sw = quantize_weight(jnp.asarray(w, jnp.float32))
        self.wq.append(wq)
        self.sw.append(sw)
        self.bias.append(jnp.asarray(bias, jnp.float32))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (1, 1), "SAME",
            dimension_numbers=dn) + jnp.asarray(bias, x.dtype)

    def finalize(self):
        # Pre-fold s_x into the per-channel rescale so the epilogue is one
        # multiply-add: y = i32 * scale[c] + bias[c].
        scales = tuple(
            (sx * sw).astype(jnp.float32)
            for sx, sw in zip(self.sx, self.sw)
        )
        return {
            "wq": tuple(self.wq),
            "scale": tuple(scales),
            "bias": tuple(self.bias),
        }, tuple(self.sx)


class _Int8Engine:
    """Quantized executor: consumes the calibrated (w_q, scale, bias) in the
    structure's visit order.  ``sx`` are static Python floats; the quantized
    tensors arrive as jit arguments (a pytree), never baked-in constants."""

    def __init__(self, qtree, sx: Sequence[float], impl: str, dtype):
        self.q = qtree
        self.sx = sx
        self.impl = impl
        self.dtype = dtype
        self.i = 0

    def conv(self, x, p=None, w=None, bias=None):
        i = self.i
        self.i += 1
        xq = _quantize_act(x, self.sx[i])
        y = _int8_conv_raw(xq, self.q["wq"][i], self.impl)
        return (y.astype(self.dtype) * self.q["scale"][i].astype(self.dtype)
                + self.q["bias"][i].astype(self.dtype))


# ------------------------------------------------ structure mirrors (one --
# per model; every conv goes through eng.conv so calibration and int8
# execution share the exact visit order).


def _bn(x, p, s, eps: float = 1e-5):
    dt = x.dtype
    inv = jax.lax.rsqrt(s["var"] + eps)
    return ((x - s["mean"].astype(dt)) * inv.astype(dt)
            * p["scale"].astype(dt) + p["bias"].astype(dt))


def _prelu(x, p):
    return jnp.where(x >= 0, x, p["negative_slope"].astype(x.dtype) * x)


def _srcnn_net(eng, params, bs, x, scale, res_scale):
    y = jax.nn.relu(eng.conv(x, params["Conv_0"]))
    y = jax.nn.relu(eng.conv(y, params["Conv_1"]))
    return eng.conv(y, params["Conv_2"])


def _espcn_net(eng, params, bs, x, scale, res_scale):
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    y = jnp.tanh(eng.conv(x, params["Conv_0"]))
    y = jnp.tanh(eng.conv(y, params["Conv_1"]))
    y = eng.conv(y, params["ICNRConvPixelShuffle_0"]["Conv_0"])
    return pixel_shuffle(y, scale)


def _vdsr_net(eng, params, bs, x, scale, res_scale):
    depth = len(params)
    y = x
    for i in range(depth - 1):
        y = jax.nn.relu(eng.conv(y, params[f"Conv_{i}"]))
    return x + eng.conv(y, params[f"Conv_{depth - 1}"])


def _edsr_net(eng, params, bs, x, scale, res_scale):
    """Mirror of kernels/apply.py::edsr_folded_forward (folded tail)."""
    from ml_super_resolution_tpu.kernels.apply import fold_tail_weights
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    x = x - jnp.asarray(0.5, x.dtype)
    head = eng.conv(x, params["Conv_0"])
    y = head
    nblocks = sum(1 for k in params if k.startswith("_EDSRBlock_"))
    for i in range(nblocks):
        bp = params[f"_EDSRBlock_{i}"]
        z = eng.conv(jnp.maximum(eng.conv(y, bp["Conv_0"]), 0), bp["Conv_1"])
        if res_scale != 1.0:
            z = z * jnp.asarray(res_scale, z.dtype)
        y = y + z
    y = eng.conv(y, params["Conv_1"]) + head
    stages = _upsample_stages(scale)
    for j, r in enumerate(stages[:-1]):
        y = pixel_shuffle(
            eng.conv(y, params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"]), r)
    r = stages[-1]
    z = eng.conv(y, params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"])
    tail = params["Conv_2"]
    out = eng.conv(z, None,
                   w=fold_tail_weights(tail["kernel"], r),
                   bias=jnp.tile(tail["bias"], r * r))
    return pixel_shuffle(out, r) + jnp.asarray(0.5, out.dtype)


def _srresnet_net(eng, params, bs, x, scale, res_scale):
    """Mirror of kernels/apply.py::srresnet_folded_forward (folded tail)."""
    from ml_super_resolution_tpu.kernels.apply import fold_tail_weights
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    use_bn = "BatchNorm_0" in params
    head = _prelu(eng.conv(x, params["Conv_0"]), params["PReLU_0"])
    y = head
    nblocks = sum(1 for k in params if k.startswith("_ResBlock_"))
    for i in range(nblocks):
        bp = params[f"_ResBlock_{i}"]
        sb = bs.get(f"_ResBlock_{i}", {}) if use_bn else {}
        z = eng.conv(y, bp["Conv_0"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_0"], sb["BatchNorm_0"])
        z = _prelu(z, bp["PReLU_0"])
        z = eng.conv(z, bp["Conv_1"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_1"], sb["BatchNorm_1"])
        y = y + z
    y = eng.conv(y, params["Conv_1"])
    if use_bn:
        y = _bn(y, params["BatchNorm_0"], bs["BatchNorm_0"])
    y = y + head
    stages = _upsample_stages(scale)
    for j, r in enumerate(stages[:-1]):
        y = pixel_shuffle(
            eng.conv(y, params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"]), r)
        y = _prelu(y, params[f"PReLU_{j + 1}"])
    r = stages[-1]
    sub = params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"]
    z = eng.conv(y, sub)
    # scalar per-channel PReLU commutes with pixel shuffle (apply.py note)
    z = _prelu(z, params[f"PReLU_{len(stages)}"])
    tail = params["Conv_2"]
    out = eng.conv(z, None,
                   w=fold_tail_weights(tail["kernel"], r),
                   bias=jnp.tile(tail["bias"], r * r))
    return pixel_shuffle(out, r)


_NETS = {
    "srcnn": _srcnn_net,
    "espcn": _espcn_net,
    "vdsr": _vdsr_net,
    "edsr": _edsr_net,
    "srresnet": _srresnet_net,
    "srgan": _srresnet_net,
}


# ------------------------------------------------------------------- API --


def int8_apply_fn(model, variables, model_name: str, scale: int,
                  calib: jnp.ndarray, impl: str = "conv",
                  dtype=jnp.float32, percentile: float = 100.0):
    """Build a jitted int8 forward for ``model_name``.

    ``calib``: a representative NHWC f32 batch in the model's *network input*
    space (LR for lr_space models, bicubic-HR for srcnn/vdsr; Y-only models
    take the luma plane).  One eager f32 pass over it fixes every activation
    scale; the returned closure then runs fully quantized convs.

    ``impl``: "conv" (integer ``conv_general_dilated``) or "dot" (explicit
    im2col + int8 ``dot_general``).  ``dtype``: float dtype for the
    epilogue / elementwise stages (f32 default; bf16 halves VPU traffic).
    ``percentile``: activation-range clip for calibration (default 100 =
    exact max-abs, measured best on this zoo) — see _CalibEngine.
    """
    if model_name not in _NETS:
        raise ValueError(f"no int8 path for model {model_name!r}; "
                         f"supported: {SUPPORTED}")
    net = _NETS[model_name]
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    res_scale = float(getattr(model, "res_scale", 1.0)) if model else 1.0

    cal = _CalibEngine(percentile)
    net(cal, params, bs, jnp.asarray(calib, jnp.float32), scale, res_scale)
    qtree, sx = cal.finalize()

    @partial(jax.jit, static_argnames=())
    def fwd(q, x):
        eng = _Int8Engine(q, sx, impl, dtype)
        return net(eng, params, bs, x.astype(dtype), scale,
                   res_scale).astype(jnp.float32)

    return partial(fwd, qtree)


def int8_output_fidelity_db(y_ref: jnp.ndarray, y_q: jnp.ndarray) -> float:
    """SNR of the quantized output against the f32 reference, in dB over the
    reference's signal range — the gate used by tests and `sr eval --int8`
    reporting."""
    ref = np.asarray(y_ref, np.float64)
    err = np.asarray(y_q, np.float64) - ref
    rng = ref.max() - ref.min()
    mse = float(np.mean(err * err))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10((rng * rng) / mse))
