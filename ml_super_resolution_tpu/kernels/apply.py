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

__all__ = ["vdsr_pallas_forward", "srresnet_pallas_forward",
           "srresnet_folded_forward", "fold_tail_weights", "pallas_apply_fn",
           "pack_blockdiag_params", "edsr_folded_packed_forward",
           "srresnet_folded_packed_forward", "vdsr_packed_forward",
           "compose_conv_kernels", "edsr_glue_plan", "edsr_composed_forward",
           "edsr_composed_packed_forward"]


def _conv(x, p, stride: int = 1):
    w, b = p["kernel"], p["bias"]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=dn
    )
    return y + b


def _bn(x, p, s, eps: float = 1e-5):
    # flax BatchNorm inference: normalize by running stats, then affine.
    # Params are stored f32; cast to the activation dtype so a bf16 trunk
    # stays bf16 (an f32 param would promote x and break the next conv).
    dt = x.dtype
    inv = jax.lax.rsqrt(s["var"] + eps)
    return ((x - s["mean"].astype(dt)) * inv.astype(dt) * p["scale"].astype(dt)
            + p["bias"].astype(dt))


def _prelu(x, p):
    return jnp.where(x >= 0, x, p["negative_slope"].astype(x.dtype) * x)


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


def fold_tail_weights(w9: jnp.ndarray, r: int):
    """Re-express a kxk conv over a PixelShuffle(r) output in pre-shuffle
    space: ``conv_k(PS(z)) == PS(conv_k2(z, W'))`` with k2 = k//r + 1.

    Derivation (ops/pixel_shuffle.py contract y[r*u+i, r*v+j, c] =
    z[u, v, (i*r+j)*C + c]): output sub-position (a, b) taps y at
    (r*s+a+dy, r*t+b+dx); writing r*s+a+dy = r*(s+du)+i gives the unique
    dy = r*du + i - a contributing to pre-shuffle tap (du, dv) and
    sub-channel (i, j).  W'[du, dv, (i*r+j)*C+c, (a*r+b)*Co+co] =
    W[r*du+i-a, r*dv+j-b, c, co] (zero when out of the kxk range).

    Why: SRResNet's 9x9x64->3 tail at HR is the model's worst MXU shape
    (N=3 of 128 lanes, at full HR resolution).  Folded, it becomes a
    5x5x256->12 conv at LR -- 4x fewer M rows, 4x the N occupancy, and the
    HR 64-channel activation is never materialized.  SAME zero-padding maps
    exactly (PS of zeros is zeros), so the fold is bit-faithful modulo conv
    summation order.

    The derivation needs a symmetric pre-shuffle kernel: k2 must be odd
    with k-1 == r*(k2-1).  Kernels that don't line up (e.g. 3x3 under r=2,
    9x9 under r=3) are zero-padded up to the next size that does — exact,
    since the padded taps are zero.  (Without this, r=3 silently DROPPED
    out-of-range .at[] writes and the fold was wrong — caught by the
    scale-3 golden.)
    """
    k = w9.shape[0]
    kp = k
    while (kp - 1) % r or (((kp - 1) // r + 1) % 2 == 0):
        kp += 2
    if kp != k:
        p = (kp - k) // 2
        w9 = jnp.pad(w9, ((p, p), (p, p), (0, 0), (0, 0)))
    k, _, cin, cout = w9.shape
    half = k // 2
    k2 = (k - 1) // r + 1
    h2 = k2 // 2
    w = jnp.zeros((k2, k2, cin * r * r, cout * r * r), w9.dtype)
    for a in range(r):
        for b in range(r):
            for du in range(-h2, h2 + 1):
                for i in range(r):
                    dy = r * du + i - a
                    if not -half <= dy <= half:
                        continue
                    for dv in range(-h2, h2 + 1):
                        for j in range(r):
                            dx = r * dv + j - b
                            if not -half <= dx <= half:
                                continue
                            w = w.at[
                                du + h2, dv + h2,
                                (i * r + j) * cin : (i * r + j + 1) * cin,
                                (a * r + b) * cout : (a * r + b + 1) * cout,
                            ].set(w9[dy + half, dx + half])
    return w


@partial(jax.jit, static_argnames=("scale", "dtype"))
def srresnet_folded_forward(params, batch_stats, x, scale: int,
                            dtype=jnp.float32):
    """SRResNet/SRGAN inference with the tail conv folded into pre-shuffle
    space (see fold_tail_weights): the final upsample stage never
    materializes the HR 64-channel activation, and the lane-starved
    9x9x64->3 HR conv becomes a 5x5x256->12 LR conv.  Pure XLA."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    def conv(y, p, w=None):
        w = p["kernel"] if w is None else w
        dn = jax.lax.conv_dimension_numbers(
            y.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, w.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
        ) + p["bias"].astype(dtype)

    use_bn = "BatchNorm_0" in params
    x = x.astype(dtype)
    head = _prelu(conv(x, params["Conv_0"]), params["PReLU_0"])
    y = head
    nblocks = sum(1 for k in params if k.startswith("_ResBlock_"))
    for i in range(nblocks):
        bp = params[f"_ResBlock_{i}"]
        bs = batch_stats.get(f"_ResBlock_{i}", {}) if use_bn else {}
        z = conv(y, bp["Conv_0"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_0"], bs["BatchNorm_0"])
        z = _prelu(z, bp["PReLU_0"])
        z = conv(z, bp["Conv_1"])
        if use_bn:
            z = _bn(z, bp["BatchNorm_1"], bs["BatchNorm_1"])
        y = y + z
    y = conv(y, params["Conv_1"])
    if use_bn:
        y = _bn(y, params["BatchNorm_0"], batch_stats["BatchNorm_0"])
    y = y + head  # long skip
    stages = _upsample_stages(scale)
    for j, r in enumerate(stages[:-1]):
        sub = params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"]
        y = pixel_shuffle(conv(y, sub), r)
        y = _prelu(y, params[f"PReLU_{j + 1}"])
    # last stage + PReLU + tail, all in pre-shuffle space
    r = stages[-1]
    sub = params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"]
    z = conv(y, sub)  # (N, h, w, r^2 * feat)
    # per-channel PReLU commutes with PS: slope c applies to every
    # sub-channel (i*r+j)*C + c (flax PReLU is a scalar slope, which
    # trivially commutes; a vector slope would need jnp.tile(slope, r*r))
    z = _prelu(z, params[f"PReLU_{len(stages)}"])
    tail = params["Conv_2"]
    wf = fold_tail_weights(tail["kernel"], r)
    dn = jax.lax.conv_dimension_numbers(
        z.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        z, wf.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    ) + jnp.tile(tail["bias"], r * r).astype(dtype)
    return pixel_shuffle(out, r).astype(jnp.float32)


def _edsr_conv(y, p, dtype, w=None):
    w = p["kernel"] if w is None else w
    dn = jax.lax.conv_dimension_numbers(
        y.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, w.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    ) + p["bias"].astype(dtype)


def _edsr_trunk(params, x, res_scale: float, dtype):
    """Mean-shifted head + residual blocks + long skip (models/edsr.py),
    shared by the folded and composed forwards.  Measured on-chip at
    168 TFLOP/s for the 32x256 flagship — 92% of the bare conv-stack
    ceiling on the same shapes (runs/probe_trunk_gap.err), so the trunk is
    kept as-is: unrolled (a lax.scan variant measured 124.8), res_scale
    multiply fused by XLA (rs-folded variant measured identical)."""
    x = x.astype(dtype) - jnp.asarray(0.5, dtype)
    head = _edsr_conv(x, params["Conv_0"], dtype)
    y = head
    nblocks = sum(1 for k in params if k.startswith("_EDSRBlock_"))
    for i in range(nblocks):
        bp = params[f"_EDSRBlock_{i}"]
        z = _edsr_conv(jnp.maximum(_edsr_conv(y, bp["Conv_0"], dtype), 0),
                       bp["Conv_1"], dtype)
        if res_scale != 1.0:
            z = z * jnp.asarray(res_scale, z.dtype)
        y = y + z
    return _edsr_conv(y, params["Conv_1"], dtype) + head  # long skip


def _edsr_glue_staged(params, y, scale: int, dtype):
    """The stage-by-stage upsample+tail glue with the tail conv folded into
    pre-shuffle space (the round-3/4 recast).  Exact reference semantics —
    also recomputes the border strips for the composed glue below."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    stages = _upsample_stages(scale)
    for j, r in enumerate(stages[:-1]):
        y = pixel_shuffle(
            _edsr_conv(y, params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"],
                       dtype), r)
    r = stages[-1]
    z = _edsr_conv(y, params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"],
                   dtype)
    tail = params["Conv_2"]
    wf = fold_tail_weights(tail["kernel"], r)
    dn = jax.lax.conv_dimension_numbers(
        z.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        z, wf.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    ) + jnp.tile(tail["bias"], r * r).astype(dtype)
    return (pixel_shuffle(out, r) + jnp.asarray(0.5, dtype)).astype(jnp.float32)


def edsr_folded_forward(params, x, scale: int, res_scale: float = 1.0,
                        dtype=jnp.float32):
    """EDSR inference with the tail conv folded into pre-shuffle space
    (models/edsr.py; same recast as srresnet_folded_forward).  EDSR's tail
    is 3x3 feat->channels at HR — the same 3-of-128-lane MXU starvation as
    SRResNet's 9x9, and the fold also skips materializing the HR feat-ch
    activation.  No BN and no activation in the upsample stages, so the
    fold needs no PReLU commutation.  Pure XLA."""
    y = _edsr_trunk(params, x, res_scale, dtype)
    return _edsr_glue_staged(params, y, scale, dtype)


# ---------------------------------------------------------------------------
# Composed glue (round-5 trunk-gap probes, runs/probe_trunk_gap.err): the
# EDSR-full glue — two ICNR stage convs + folded tail — measured 31.06 ms of
# the 90.3 ms frame (34% of time for 24% of FLOPs, running at 102 vs the
# trunk's 168 TFLOP/s), and the baseline glue is 4.93 of 9.8 ms.  EDSR's
# upsample stages carry NO activation (models/edsr.py: "paper: no activation
# inside the upsample stages"), so stage-conv -> PS -> stage-conv -> tail is
# entirely LINEAR and composes exactly into ONE small LR conv:
#
#   x4: C1   = compose(A1, fold(T, 2))        (5,5,F,12)   at 2x res
#       C1f  = fold(C1, 2)                    (3,3,4F,12*4) at LR
#       Call = compose(A0, C1f)               (5,5,F,48)   at LR
#   out = PS2(PS2(Call * y + beta))           (biases propagate per-channel)
#
# 3.17 TFLOP of glue becomes 0.16 TFLOP (x2/x3 analogous, one stage).  SAME
# zero-padding does NOT commute with composition (each staged conv truncates
# its intermediate at the frame edge; the composed conv sees y's zero-pad
# instead), so a border band of width <= the glue's LR receptive field is
# recomputed with the exact staged glue on thin edge strips and spliced —
# the same edge-fixup pattern tiled inference uses (infer.py::_apply_net).
# Interior + strips together reproduce the staged math exactly (goldens:
# tests/test_composed_glue.py).
# ---------------------------------------------------------------------------


def compose_conv_kernels(ka, kb):
    """Compose two SAME-conv (correlation) kernels into one: if
    z = corr(y, ka) and out = corr(z, kb) (both HWIO, no padding truncation),
    then out = corr(y, C) with C[t] = sum_{r+s=t} ka[r] @ kb[s] — shape
    (ha+hb-1, wa+wb-1, ci, co).  Computed as a conv: ka viewed as a
    ci-batch of (ha,wa,m) images correlated with the spatially-flipped kb."""
    ha, wa, ci, m = ka.shape
    hb, wb, m2, co = kb.shape
    assert m == m2, (ka.shape, kb.shape)
    img = jnp.transpose(ka, (2, 0, 1, 3))          # (ci, ha, wa, m)
    kern = kb[::-1, ::-1]                          # flip -> convolution
    dn = jax.lax.conv_dimension_numbers(
        img.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST: this conv COMPUTES the composed kernel's entries.  At TPU
    # default precision (single-pass bf16) the plan weights themselves lose
    # mantissa, and a plan built on-device then disagrees with the same
    # plan built on CPU by a few uint8 output steps (observed: the EDSR-full
    # SRX1 artifact check, runs/aot_chip_check_edsr_full.out, diff=3).
    # Construction is once-per-route, so precision here is free.
    out = jax.lax.conv_general_dilated(
        img, kern, (1, 1), [(hb - 1, hb - 1), (wb - 1, wb - 1)],
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(out, (1, 2, 0, 3))        # (ha+hb-1, .., ci, co)


def edsr_glue_plan(params, scale: int):
    """Fold+compose the whole EDSR upsample+tail glue into one LR conv.

    Returns ``(C, beta)``: out_LR = corr(y, C) + beta, followed by
    ``pixel_shuffle(r)`` for each stage factor in order (the outermost fold
    is performed last, so its (i*r+j)-major channel contract is the first
    shuffle's).  Biases stay per-channel vectors: a constant-in,
    b -> sum_hw,i C[h,w,i,o]*b[i] propagation per composition step — exact
    for interior pixels; border truncation is the strips' job."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages

    stages = _upsample_stages(scale)
    tail = params["Conv_2"]
    r = stages[-1]
    C = fold_tail_weights(tail["kernel"], r)
    beta = jnp.tile(tail["bias"], r * r)
    last = params[f"ICNRConvPixelShuffle_{len(stages) - 1}"]["Conv_0"]
    beta = jnp.einsum("hwio,i->o", C, last["bias"],
                      precision=jax.lax.Precision.HIGHEST) + beta
    C = compose_conv_kernels(last["kernel"], C)
    for j in reversed(range(len(stages) - 1)):
        rj = stages[j]
        C = fold_tail_weights(C, rj)
        beta = jnp.tile(beta, rj * rj)
        stage = params[f"ICNRConvPixelShuffle_{j}"]["Conv_0"]
        beta = jnp.einsum("hwio,i->o", C, stage["bias"],
                          precision=jax.lax.Precision.HIGHEST) + beta
        C = compose_conv_kernels(stage["kernel"], C)
    return C, beta


# LR border band recomputed by the staged glue: must cover the composed
# glue's LR receptive-field radius (x4: ceil(1 + 1/2 + 1/4) = 2; 3 = margin).
_STRIP_HALO = 3


def _edsr_glue_composed(params, y, scale: int, dtype, plan=None):
    """One-conv composed glue + exact staged border strips (see module
    comment above).  Falls back to the staged glue outright when the frame
    is too small for strips to make sense.  ``plan`` is a precomputed
    ``edsr_glue_plan`` result; pass it from outside any timed/jitted loop —
    the fold/compose chains are loop-invariant but XLA does not reliably
    hoist them, and rebuilding the plan per call costs real milliseconds."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages
    from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    b = _STRIP_HALO
    h, w = y.shape[1:3]
    if h < 4 * b or w < 4 * b:
        return _edsr_glue_staged(params, y, scale, dtype)
    C, beta = edsr_glue_plan(params, scale) if plan is None else plan
    dn = jax.lax.conv_dimension_numbers(
        y.shape, C.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        y, C.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    ) + beta.astype(dtype)
    for r in _upsample_stages(scale):
        z = pixel_shuffle(z, r)
    out = (z + jnp.asarray(0.5, dtype)).astype(jnp.float32)
    # Exact border fixup: outer-b rows/cols from staged strips whose far
    # edge is the true frame edge (full-width strips also fix the corners).
    # Strip cost is per-OP relay overhead, not FLOPs (probe_composed.err:
    # ~15 ms for 4 separate strip calls) — so opposite strips are BATCHED
    # into one staged call each (same shape), halving the op count.
    s = scale
    n = y.shape[0]
    tb = _edsr_glue_staged(
        params, jnp.concatenate([y[:, : 2 * b], y[:, -2 * b:]], axis=0),
        scale, dtype)
    out = jnp.concatenate(
        [tb[:n, : b * s], out[:, b * s : (h - b) * s], tb[n:, -b * s:]],
        axis=1)
    lr_ = _edsr_glue_staged(
        params, jnp.concatenate([y[:, :, : 2 * b], y[:, :, -2 * b:]],
                                axis=0), scale, dtype)
    out = jnp.concatenate(
        [lr_[:n, :, : b * s], out[:, :, b * s : (w - b) * s],
         lr_[n:, :, -b * s:]], axis=2)
    return out


def edsr_composed_forward(params, x, scale: int, res_scale: float = 1.0,
                          dtype=jnp.float32, plan=None):
    """EDSR inference with the WHOLE upsample+tail glue composed into one
    LR conv (+ exact border strips).  Same math as edsr_folded_forward /
    models/edsr.py up to float reassociation; the default edsr route
    (infer.py, SR_COMPOSED_TAIL=0 restores the staged fold).  Callers on a
    hot path should precompute ``plan = edsr_glue_plan(params, scale)``
    once (eagerly) and pass it through."""
    y = _edsr_trunk(params, x, res_scale, dtype)
    return _edsr_glue_composed(params, y, scale, dtype, plan=plan)


# ---------------------------------------------------------------------------
# Batch-to-lanes packing (VERDICT r4 / MFU probes, runs/probe_mfu.err):
# a 64-feature trunk conv occupies half of the MXU's 128 lanes, capping
# useful throughput at ~59-64 TFLOP/s on v5e; packing TWO frames into the
# channel axis with block-diagonal kernels issues 2x the MACs but runs them
# at the full-lane rate (measured: 97.6 useful TFLOP/s packed vs 64.4
# unpacked for the same useful work — 1.52x).  The packed tree flows through
# the existing folded forwards unchanged; only kernels that feed a
# pixel-shuffle (ICNR stage convs) need their OUTPUT channels permuted so
# the PS contract y[.., (i*r+j)*C + c] (ops/pixel_shuffle.py) still holds
# with C = reps*feat.  All inserted weights are exact zeros, so the packed
# math equals the per-frame math (golden: tests/test_lane_packing.py).
# ---------------------------------------------------------------------------


def _blockdiag_kernel(k, reps: int):
    h, w, ci, co = k.shape
    out = jnp.zeros((h, w, reps * ci, reps * co), k.dtype)
    for t in range(reps):
        out = out.at[:, :, t * ci:(t + 1) * ci, t * co:(t + 1) * co].set(k)
    return out


def _blockdiag_kernel_shuffled(k, reps: int, r: int):
    """Block-diag packing of a pre-PixelShuffle conv kernel, output channels
    laid out (i*r+j)*(reps*feat) + t*feat + c so that pixel_shuffle(r) (and
    fold_tail_weights, which assumes the same contract) keep working on the
    packed tensor.  Per-frame layout was (i*r+j)*feat + c."""
    h, w, ci, co = k.shape
    feat = co // (r * r)
    k5 = k.reshape(h, w, ci, r * r, feat)
    out = jnp.zeros((h, w, reps * ci, r * r, reps, feat), k.dtype)
    for t in range(reps):
        out = out.at[:, :, t * ci:(t + 1) * ci, :, t, :].set(k5)
    return out.reshape(h, w, reps * ci, reps * co)


def _shuffled_bias(b, reps: int, r: int):
    feat = b.shape[0] // (r * r)
    b3 = b.reshape(r * r, 1, feat)
    return jnp.broadcast_to(b3, (r * r, reps, feat)).reshape(-1)


def pack_blockdiag_params(tree, reps: int = 2, scale: int | None = None):
    """Pack a zoo param (or batch_stats) tree for ``reps``-frame lane packing:
    4-D conv kernels become block-diagonal, 1-D params (biases, BN stats)
    tile; subtrees named ``ICNRConvPixelShuffle_j`` get the shuffle-aware
    permuted packing (their stage factor r comes from _upsample_stages(scale),
    models/srresnet.py).  Scalars (PReLU slopes) commute and pass through."""
    from ml_super_resolution_tpu.models.srresnet import _upsample_stages

    stages = _upsample_stages(scale) if scale else []

    def rec(node, shuffle_r=None):
        if hasattr(node, "items"):
            out = {}
            for kk, vv in node.items():
                r = shuffle_r
                if kk.startswith("ICNRConvPixelShuffle_"):
                    r = stages[int(kk.rsplit("_", 1)[1])]
                out[kk] = rec(vv, shuffle_r=r)
            return out
        a = jnp.asarray(node)
        if a.ndim == 4:
            return (_blockdiag_kernel_shuffled(a, reps, shuffle_r)
                    if shuffle_r else _blockdiag_kernel(a, reps))
        if a.ndim == 1:
            return (_shuffled_bias(a, reps, shuffle_r)
                    if shuffle_r else jnp.tile(a, reps))
        return a

    return rec(tree)


def _pack_frames(x, reps: int):
    n, h, w, c = x.shape
    g = n // reps
    return (x.reshape(g, reps, h, w, c)
             .transpose(0, 2, 3, 1, 4)
             .reshape(g, h, w, reps * c))


def _unpack_frames(y, reps: int):
    g, h, w, cc = y.shape
    c = cc // reps
    return (y.reshape(g, h, w, reps, c)
             .transpose(0, 3, 1, 2, 4)
             .reshape(g * reps, h, w, c))


@partial(jax.jit, static_argnames=("scale", "reps", "res_scale", "dtype"))
def edsr_folded_packed_forward(packed_params, x, scale: int, reps: int = 2,
                               res_scale: float = 1.0, dtype=jnp.float32):
    """EDSR folded inference over lane-packed frames: ``packed_params`` from
    pack_blockdiag_params(params, reps, scale); x has batch divisible by
    reps.  Same math as edsr_folded_forward per frame."""
    y = edsr_folded_forward(packed_params, _pack_frames(x, reps), scale,
                            res_scale=res_scale, dtype=dtype)
    return _unpack_frames(y, reps)


@partial(jax.jit, static_argnames=("scale", "reps", "res_scale", "dtype"))
def edsr_composed_packed_forward(packed_params, x, scale: int, reps: int = 2,
                                 res_scale: float = 1.0, dtype=jnp.float32,
                                 plan=None):
    """Lane-packed EDSR with the composed one-conv glue: the fold/compose
    algebra is layout-agnostic, so it applies to the block-diagonal
    shuffle-aware packed tree unchanged (the strips reuse the staged glue
    on the same packed tree, as edsr_folded_packed_forward does).  Pass a
    precomputed ``edsr_glue_plan(packed_params, scale)`` on hot paths."""
    y = edsr_composed_forward(packed_params, _pack_frames(x, reps), scale,
                              res_scale=res_scale, dtype=dtype, plan=plan)
    return _unpack_frames(y, reps)


@partial(jax.jit, static_argnames=("scale", "reps", "dtype"))
def srresnet_folded_packed_forward(packed_params, packed_stats, x, scale: int,
                                   reps: int = 2, dtype=jnp.float32):
    """SRResNet/SRGAN folded inference over lane-packed frames (BN running
    stats tile per frame block, scalar PReLU slopes commute)."""
    y = srresnet_folded_forward(packed_params, packed_stats,
                                _pack_frames(x, reps), scale, dtype=dtype)
    return _unpack_frames(y, reps)


@partial(jax.jit, static_argnames=("reps", "dtype"))
def vdsr_packed_forward(packed_params, x, reps: int = 2, dtype=jnp.float32):
    """VDSR inference over lane-packed frames, pure XLA: the 64-feature
    HR-space trunk is exactly the half-lane shape the packing fixes.  No
    pixel shuffle anywhere, so plain block-diag packing suffices."""
    xp = _pack_frames(x, reps).astype(dtype)

    def conv(y, p):
        w = p["kernel"].astype(dtype)
        dn = jax.lax.conv_dimension_numbers(
            y.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=dn
        ) + p["bias"].astype(dtype)

    depth = len(packed_params)
    y = xp
    for i in range(depth - 1):
        y = jax.nn.relu(conv(y, packed_params[f"Conv_{i}"]))
    y = conv(y, packed_params[f"Conv_{depth - 1}"]) + xp  # global residual
    return _unpack_frames(y, reps).astype(jnp.float32)


def pallas_apply_fn(model_name: str, variables, scale: int):
    """The ``--pallas`` routing used by infer.py; None = no fused path."""
    if model_name == "vdsr":
        params = variables["params"]
        import os

        # Round-5 decision record (VERDICT r4 weak #4 / next #5): lane
        # packing moved the XLA bar 51% above the fused kernel (packed2-b2
        # 64.4 MP/s vs 44.1, BENCH_r04.json), so EVEN batches route to the
        # packed-XLA forward.  A pack-aware (128-lane) kernel was evaluated
        # and REJECTED on arithmetic, not taste: packed-XLA b2 runs
        # ~compute-bound at 85.7 TFLOP/s useful (64.43 ms / 5.52 TFLOP),
        # while the kernel's row-block halo recompute issues >=2.1x the
        # useful FLOPs — it would need >=180 TFLOP/s sustained (91% of v5e
        # bf16 peak) just to tie, against its measured 123.6 TFLOP/s issued
        # (44.1 MP/s b1).  Same class of record as fused-ESPCN v2
        # (kernels/attic/).  The kernel keeps the b1/odd-batch slot, where
        # packing cannot apply and it still beats XLA-bf16 (44.1 vs 42.6).
        fused_ok = (os.environ.get("SR_VDSR_FUSED") != "0"
                    and params["Conv_0"]["kernel"].shape[2] == 1)
        pp = pack_blockdiag_params(params, 2)

        if fused_ok:
            from ml_super_resolution_tpu.kernels.vdsr_fused import (
                vdsr_fused_forward,
            )

            def vdsr_route(inp):
                if inp.shape[0] % 2 == 0:
                    # bf16 matches the fused kernel's precision class
                    return vdsr_packed_forward(pp, inp, reps=2,
                                               dtype=jnp.bfloat16)
                return vdsr_fused_forward(params, inp)

            return vdsr_route

        # Fallback: packed XLA for even batches, K2 fused residual head
        # (on-device validated, fast compile) otherwise.
        def vdsr_route_nofused(inp):
            if inp.shape[0] % 2 == 0:
                return vdsr_packed_forward(pp, inp, reps=2,
                                           dtype=jnp.bfloat16)
            return vdsr_pallas_forward(params, inp)

        return vdsr_route_nofused
    if model_name in ("srresnet", "srgan"):
        return lambda inp: srresnet_pallas_forward(
            variables["params"], variables.get("batch_stats", {}), inp, scale
        )
    return None
