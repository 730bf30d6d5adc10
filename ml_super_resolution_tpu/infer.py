"""Full-frame / video inference: the reference's ``upscale`` flow (SURVEY §3.3).

Classic SR protocol: the network upscales **luma**; chroma is bicubic-upscaled
and re-merged (for Y-channel models).  RGB models (SRResNet/SRGAN) forward all
three channels.  Frames can be processed whole on one device or row-band
tiled across the ``space`` mesh axis with halo exchange (``parallel/tiling``),
producing bitwise-identical output (BASELINE.json:11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ml_super_resolution_tpu.models import MODEL_SPECS
from ml_super_resolution_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
from ml_super_resolution_tpu.ops.resize import imresize
from ml_super_resolution_tpu.parallel.tiling import tiled_apply, tiled_apply_2d

__all__ = ["d4_ensemble", "make_int8_apply_fn", "upscale_frames",
           "upscale_image", "upscale_luma_frames", "upscale_y4m_stream"]


def make_int8_apply_fn(model, variables, model_name: str, scale: int,
                       frames_u8):
    """Build the PTQ int8 forward (quant.py) calibrated on uint8 RGB
    ``frames_u8`` — runs the same preprocessing as :func:`upscale_frames`
    to land in network-input space, then calibrates eagerly.  The result is
    a shape-generic ``prebuilt_apply_fn`` for repeated/traced use (serving,
    AOT export) where per-call self-calibration would be wrong or unsafe.
    """
    spec = MODEL_SPECS[model_name]
    x = jnp.asarray(frames_u8).astype(jnp.float32) / 255.0
    if spec["y_only"]:
        x = rgb_to_ycbcr(x)[..., :1]
    net_calib = _network_input(x, scale, spec["lr_space"])
    return _make_apply_fn(model, variables, model_name, scale,
                          use_pallas=False, tiled=False,
                          int8_calib=net_calib[:1])


def d4_ensemble(apply_fn):
    """Geometric self-ensemble (EDSR+, arXiv:1707.02921 §5): average the
    network output over the 8 dihedral transforms of the input (4 rotations
    x horizontal flip), each inverse-transformed back to frame orientation.

    SR nets are only approximately D4-equivariant (conv weights are not
    symmetric), so the 8 predictions differ and their mean is a standard
    test-time quality gain at 8x inference cost.  ``apply_fn`` must accept
    NHWC batches of either (h, w) or (w, h) spatial shape — every route in
    this repo (flax apply, folded tails, tiled halo-exchange) is
    shape-generic, so the wrapper composes with all of them; under jit the
    two orientations simply trace as two static shapes.

    TPU-first scheduling: the 8 members split into two orientation groups
    of 4 (k∈{0,2} keep (h,w); k∈{1,3} are (w,h)), each group STACKED on the
    batch axis and run as ONE 4N-batch apply — two forwards instead of
    eight, so small-batch models keep the MXU fed (measured batch scaling:
    ESPCN bf16 b8→b32 is +25% MP/s).
    """

    def fn(x):
        n = x.shape[0]
        acc = None
        for base in (0, 1):  # orientation: k=base and k=base+2
            xr = jnp.rot90(x, base, axes=(1, 2))
            members = [xr, xr[:, :, ::-1] if base == 0 else xr[:, ::-1]]
            members += [jnp.rot90(m, 2, axes=(1, 2)) for m in members]
            ys = apply_fn(jnp.concatenate(members, axis=0))
            parts = [ys[i * n:(i + 1) * n] for i in range(4)]
            # undo: members were [t, f∘t, r2∘t, r2∘f∘t] with t = rot90^base
            parts[1] = parts[1][:, :, ::-1] if base == 0 else parts[1][:, ::-1]
            parts[3] = jnp.rot90(parts[3], 2, axes=(1, 2))
            parts[2] = jnp.rot90(parts[2], 2, axes=(1, 2))
            parts[3] = parts[3][:, :, ::-1] if base == 0 else parts[3][:, ::-1]
            for p in parts:
                p = jnp.rot90(p, -base, axes=(1, 2))
                acc = p if acc is None else acc + p
        return acc / 8.0

    return fn


def _network_input(y_or_rgb: jnp.ndarray, scale: int, lr_space: bool) -> jnp.ndarray:
    return y_or_rgb if lr_space else imresize(y_or_rgb, scale=float(scale))


def _replicate_over_mesh(variables, mesh):
    """params may be committed to a single device; replicate them over the
    tiling mesh so the shard_map closure sees mesh-consistent operands."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(variables, NamedSharding(mesh, PartitionSpec()))


def _make_apply_fn(model, variables, model_name: str, scale: int,
                   use_pallas: bool, tiled: bool, int8_calib=None):
    """Forward closure: XLA by default; Pallas-routed when requested;
    int8-quantized (quant.py) when ``int8_calib`` (an NHWC f32 calibration
    batch in network-input space) is given — int8 wins over --pallas."""
    if int8_calib is not None:
        from ml_super_resolution_tpu.quant import int8_apply_fn

        # a --bf16-rebuilt model carries dtype=bf16: the int8 epilogue /
        # elementwise stages follow the model's compute dtype everywhere
        return int8_apply_fn(model, variables, model_name, scale, int8_calib,
                             dtype=getattr(model, "dtype", jnp.float32))
    if use_pallas:
        spec = MODEL_SPECS[model_name]
        if model_name == "espcn" and spec["y_only"] and not tiled:
            from ml_super_resolution_tpu.kernels.espcn_fused import (
                espcn_fused_forward,
                extract_espcn_weights,
            )

            fused_weights = extract_espcn_weights(variables["params"])
            return lambda inp: espcn_fused_forward(fused_weights, inp, scale)
        # K1/K2-routed forwards (vdsr, srresnet, srgan) — kernels are
        # shape-generic, so they also run per-shard under tiling.  Models
        # with no fused path (srcnn, edsr) return None -> flax fallback.
        from ml_super_resolution_tpu.kernels.apply import pallas_apply_fn

        fn = pallas_apply_fn(model_name, variables, scale)
        if fn is not None:
            return fn
    # Folded routes honour the model's compute dtype (a bf16-rebuilt model —
    # serve --bf16 / upscale --bf16 — folds in bf16: the 152 MP/s config).
    dtype = getattr(model, "dtype", jnp.float32)
    # Lane packing (kernels/apply.py): PAIRS of frames ride the channel
    # axis with block-diagonal kernels, filling the MXU's 128 lanes on
    # 64-feature trunks.  Identical math (goldens in
    # tests/test_lane_packing.py); applies only when the runtime batch is
    # even.  Routed per model by _LANE_PACK_DEFAULT (measured decision
    # table); SR_LANE_PACK=1/0 force-overrides for every model.
    pack = _lane_pack_on(model_name)
    if model_name == "edsr" and _env_on("SR_FOLDED_TAIL"):
        from ml_super_resolution_tpu.kernels.apply import (
            edsr_composed_forward,
            edsr_composed_packed_forward,
            edsr_folded_forward,
            edsr_folded_packed_forward,
            pack_blockdiag_params,
        )

        # Composed one-conv glue (kernels/apply.py; round-5 probes: the
        # staged glue was 34% of flagship frame time for 24% of its FLOPs).
        # SR_COMPOSED_TAIL=0 restores the staged fold everywhere.  Two
        # measured size gates (runs/probe_composed.err):
        #  - lane packing only fills idle lanes: features >= 128 already
        #    saturates the MXU, so packing is gated to features < 128;
        #  - the composed glue's staged border strips are a ~fixed per-call
        #    relay overhead, amortized by big trunks (flagship composed-b1
        #    76.7 ms beats folded 90.3) but not by the 64-feature baseline
        #    at odd batches (composed 20.9 vs folded 9.6) — so UNPACKED
        #    composed is gated to features >= 128; even baseline batches
        #    take composed+packed (250.7 MP/s, the best measured route).
        # Glue plans are built HERE, eagerly, once per route — rebuilding
        # the fold/compose chain inside a jitted loop costs milliseconds.
        from ml_super_resolution_tpu.kernels.apply import edsr_glue_plan

        composed = _env_on("SR_COMPOSED_TAIL")
        feats = int(getattr(model, "features", 64))
        rs = float(getattr(model, "res_scale", 1.0))
        pack = pack and feats < 128
        composed_unpacked = composed and feats >= 128
        pp = (pack_blockdiag_params(variables["params"], 2, scale)
              if pack else None)
        plan = pplan = None
        if composed_unpacked:
            plan = edsr_glue_plan(variables["params"], scale)
        if composed and pp is not None:
            pplan = edsr_glue_plan(pp, scale)

        def edsr_fn(inp):
            if pp is not None and inp.shape[0] % 2 == 0:
                if composed:
                    return edsr_composed_packed_forward(
                        pp, inp, scale, reps=2, res_scale=rs, dtype=dtype,
                        plan=pplan)
                return edsr_folded_packed_forward(
                    pp, inp, scale, reps=2, res_scale=rs, dtype=dtype)
            if composed_unpacked:
                return edsr_composed_forward(
                    variables["params"], inp, scale, res_scale=rs,
                    dtype=dtype, plan=plan)
            return edsr_folded_forward(
                variables["params"], inp, scale, res_scale=rs, dtype=dtype)

        return edsr_fn
    if model_name in ("srresnet", "srgan") and _env_on("SR_FOLDED_TAIL"):
        # Default srresnet/srgan inference is the folded-tail recast
        # (kernels/apply.py): exact weight rearrangement, identical
        # receptive field, measured 3.6x the whole-net XLA path on-device
        # (the HR 9x9x64->3 tail was ~70% of frame time at 3/128 MXU
        # lanes).  SR_FOLDED_TAIL=0 restores the plain flax apply.
        from ml_super_resolution_tpu.kernels.apply import (
            pack_blockdiag_params,
            srresnet_folded_forward,
            srresnet_folded_packed_forward,
        )

        stats = variables.get("batch_stats", {})
        pp = ps = None
        if pack:
            pp = pack_blockdiag_params(variables["params"], 2, scale)
            ps = pack_blockdiag_params(stats, 2, scale)

        def srresnet_fn(inp):
            if pp is not None and inp.shape[0] % 2 == 0:
                return srresnet_folded_packed_forward(
                    pp, ps, inp, scale, reps=2, dtype=dtype)
            return srresnet_folded_forward(
                variables["params"], stats, inp, scale, dtype=dtype)

        return srresnet_fn
    if model_name == "vdsr" and pack:
        from ml_super_resolution_tpu.kernels.apply import (
            pack_blockdiag_params,
            vdsr_packed_forward,
        )

        pp = pack_blockdiag_params(variables["params"], 2)

        def vdsr_fn(inp):
            if inp.shape[0] % 2 == 0:
                return vdsr_packed_forward(pp, inp, reps=2, dtype=dtype)
            return model.apply(variables, inp, train=False)

        return vdsr_fn
    return lambda inp: model.apply(variables, inp, train=False)


def _env_on(name: str, default: str = "1") -> bool:
    import os

    return os.environ.get(name, default) not in ("0", "false", "")


# Per-model lane-packing routing decision (VERDICT r4 next #2), from the
# driver-recorded chip rows (BENCH_r04.json tail, 1080p x4 bf16):
#   vdsr:      packed2-b2 64.4 MP/s vs fused-kernel 44.1 / XLA-bf16 42.6
#              -> packed is the default even-batch route (+51%).
#   edsr:      composed-packed2-b2 252.6 MP/s vs folded-b1 211.9 — with the
#              round-5 composed glue, packed even batches WIN (+19%); the
#              packed route only engages on even batches, b1 stays folded
#              (runs/bench_r5_preview.err).
#   srresnet/srgan: folded-packed2-b2 143.1 LOSES to folded-b1 153.8
#              (runs/bench_r5_preview.err) -> OFF; the BN/PReLU trunk gains
#              less from lane fill than its glue loses from the batch dim.
_LANE_PACK_DEFAULT = {"vdsr": True, "edsr": True,
                      "srresnet": False, "srgan": False}


def _lane_pack_on(model_name: str) -> bool:
    import os

    v = os.environ.get("SR_LANE_PACK")
    if v is not None:
        return v not in ("0", "false", "")
    return _LANE_PACK_DEFAULT.get(model_name, False)


def _apply_net(apply_fn, net_in: jnp.ndarray, mesh, net_halo: int,
               net_scale: int) -> jnp.ndarray:
    """Run the conv stack whole-frame, or row/column-band tiled with halo
    exchange over the mesh's ``space``/``space_w`` axes (pad + exact edge
    fixup for indivisible sizes — bitwise-identical to whole-frame)."""
    nsp = mesh.shape.get("space", 1) if mesh is not None else 1
    nsw = mesh.shape.get("space_w", 1) if mesh is not None else 1
    h, w = net_in.shape[1:3]
    pad_h = (-h) % nsp if nsp > 1 else 0
    pad_w = (-w) % nsw if nsw > 1 else 0
    ok_h = nsp <= 1 or (h + pad_h) // nsp >= 2 * net_halo
    ok_w = nsw <= 1 or (w + pad_w) // nsw >= 2 * net_halo
    if not ((nsp > 1 or nsw > 1) and ok_h and ok_w):
        # frame too small to tile at this halo, or no spatial axes: whole
        return apply_fn(net_in)
    net_in_p = (
        jnp.pad(net_in, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if (pad_h or pad_w)
        else net_in
    )
    if nsw > 1:
        sr = tiled_apply_2d(apply_fn, net_in_p, mesh, halo=net_halo, scale=net_scale)
    else:
        sr = tiled_apply(apply_fn, net_in_p, mesh, halo=net_halo, scale=net_scale)
    sr = sr[:, : h * net_scale, : w * net_scale]
    # Zero-padding is not SAME padding once convs stack: the last
    # ``halo`` real rows/cols saw pad-region activations.  Recompute
    # them exactly with short whole-frame strips whose far edge is the
    # true frame edge (the strips run over the *unpadded* input, so the
    # bottom-right corner is exact in both).
    fix = net_halo * net_scale
    if pad_h:
        strip = apply_fn(net_in[:, h - min(h, 2 * net_halo) :])
        sr = jnp.concatenate(
            [sr[:, : (h - net_halo) * net_scale], strip[:, -fix:]], axis=1
        )
    if pad_w:
        strip = apply_fn(net_in[:, :, w - min(w, 2 * net_halo) :])
        sr = jnp.concatenate(
            [sr[:, :, : (w - net_halo) * net_scale], strip[:, :, -fix:]],
            axis=2,
        )
    return sr


def upscale_frames(
    model,
    variables,
    frames_u8: jnp.ndarray,
    model_name: str,
    scale: int,
    mesh=None,
    use_pallas: bool = False,
    ensemble: bool = False,
    int8: bool = False,
    prebuilt_apply_fn=None,
) -> jnp.ndarray:
    """Upscale a batch of LR RGB frames ``(N, h, w, 3)`` uint8 -> HR uint8.

    With ``mesh`` (containing a ``space`` axis of size > 1) the conv stack
    runs row-band-tiled with halo exchange; otherwise whole-frame.
    ``use_pallas`` routes ESPCN through the fully-fused VMEM-resident kernel
    (kernels/espcn_fused.py); numerically identical, opt-in.  ``ensemble``
    averages the 8 dihedral self-ensemble predictions (EDSR+): the ensemble
    wraps the *whole* forward (including tiling), so tiled output stays
    bitwise-identical to whole-frame output per transform.  ``int8`` runs
    the PTQ-quantized conv stack (quant.py), self-calibrated on the first
    frame — the int8-MXU serving path.
    """
    spec = MODEL_SPECS[model_name]
    y_only = spec["y_only"]
    lr_space = spec["lr_space"]
    halo = spec["rf_radius"](scale)

    tiled = mesh is not None and mesh.shape.get("space", 1) > 1
    if tiled:
        variables = _replicate_over_mesh(variables, mesh)

    x = frames_u8.astype(jnp.float32) / 255.0

    if y_only:
        ycbcr = rgb_to_ycbcr(x)
        net_in = _network_input(ycbcr[..., :1], scale, lr_space)
        chroma = imresize(ycbcr[..., 1:], scale=float(scale))
    else:
        net_in = _network_input(x, scale, lr_space)
        chroma = None

    # prebuilt_apply_fn: callers that must stay trace-safe (aot.py exports
    # the whole pipeline under jax.export) pass a ready-made forward — int8
    # calibration does eager readbacks and cannot run inside a trace.
    apply_fn = prebuilt_apply_fn if prebuilt_apply_fn is not None else \
        _make_apply_fn(model, variables, model_name, scale, use_pallas,
                       tiled, int8_calib=net_in[:1] if int8 else None)
    net_fn = lambda z: _apply_net(apply_fn, z, mesh, halo, scale if lr_space else 1)
    sr = (d4_ensemble(net_fn) if ensemble else net_fn)(net_in)

    if y_only:
        out = ycbcr_to_rgb(jnp.concatenate([sr, chroma], axis=-1))
    else:
        out = sr
    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def upscale_luma_frames(
    model,
    variables,
    luma_u8: jnp.ndarray,
    model_name: str,
    scale: int,
    mesh=None,
    use_pallas: bool = False,
    ensemble: bool = False,
    int8: bool = False,
) -> jnp.ndarray:
    """Upscale a batch of raw luma planes ``(N, h, w, 1)`` uint8 -> HR uint8.

    The Y4M video path (``data/video.py``): frames already arrive as BT.601
    studio-swing Y planes — the exact space Y-channel models train in — so
    the network consumes them with no color conversion.  Chroma is handled
    by the caller at its own subsampled resolution.  Y-only models only.
    """
    spec = MODEL_SPECS[model_name]
    if not spec["y_only"]:
        raise ValueError(
            f"{model_name} is an RGB model; convert planes via ops.color "
            "and use upscale_frames")
    tiled = mesh is not None and mesh.shape.get("space", 1) > 1
    if tiled:
        variables = _replicate_over_mesh(variables, mesh)
    net_in = _network_input(
        luma_u8.astype(jnp.float32) / 255.0, scale, spec["lr_space"])
    apply_fn = _make_apply_fn(model, variables, model_name, scale, use_pallas,
                              tiled,
                              int8_calib=net_in[:1] if int8 else None)
    net_fn = lambda z: _apply_net(apply_fn, z, mesh, spec["rf_radius"](scale),
                                  scale if spec["lr_space"] else 1)
    sr = (d4_ensemble(net_fn) if ensemble else net_fn)(net_in)
    return jnp.round(jnp.clip(sr, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def upscale_y4m_stream(rd, make_writer, model, variables, model_name: str,
                       scale: int, mesh=None, batch: int = 8,
                       use_pallas: bool = False, ensemble: bool = False,
                       int8: bool = False):
    """Upscale a Y4M stream: ``rd`` (an open Y4MReader) -> a writer built by
    ``make_writer(out_meta)``.  Returns ``(out_meta, frames_done)``.

    The one Y4M pipeline, shared by the CLI file path (``sr upscale
    in.y4m``) and the HTTP streaming endpoint (``POST /upscale_y4m``):
    Y-channel models consume the container's studio-swing luma planes with
    zero color conversion and chroma is protocol-bicubic-upscaled at its
    own subsampled resolution (4:2:0 stays 4:2:0); RGB models
    (srresnet/srgan/edsr) need full-resolution color, so their output is
    C444.  Frames are processed in batches of ``batch``.
    """
    import dataclasses as _dc

    from ml_super_resolution_tpu.models import MODEL_SPECS
    from ml_super_resolution_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
    from ml_super_resolution_tpu.ops.resize import imresize

    y_only = MODEL_SPECS[model_name]["y_only"]
    meta = rd.meta
    mono = meta.chroma_div is None
    out_cs = meta.colorspace if (y_only or mono) else "C444"
    out_meta = _dc.replace(
        meta, width=meta.width * scale, height=meta.height * scale,
        colorspace=out_cs)
    wr = make_writer(out_meta)
    done = 0

    def to_u8(x):
        return np.asarray(
            jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8))

    def flush(frames):
        nonlocal done
        ys = jnp.asarray(np.stack([f[0] for f in frames]))[..., None]
        if y_only:
            sr_y = np.asarray(upscale_luma_frames(
                model, variables, ys, model_name, scale, mesh=mesh,
                use_pallas=use_pallas, ensemble=ensemble, int8=int8))[..., 0]
            if mono:
                cbcr_sr = [(None, None)] * len(frames)
            else:
                cbcr = jnp.asarray(np.stack(
                    [np.stack([f[1], f[2]], axis=-1) for f in frames]
                )).astype(jnp.float32) / 255.0
                up = to_u8(imresize(cbcr, scale=float(scale)))
                cbcr_sr = [(up[i, ..., 0], up[i, ..., 1])
                           for i in range(len(frames))]
        else:
            if mono:
                rgb = np.stack([f[0] for f in frames])[..., None]
                rgb = np.repeat(rgb, 3, axis=-1)
            else:
                y = jnp.asarray(
                    np.stack([f[0] for f in frames])
                ).astype(jnp.float32)[..., None] / 255.0
                cbcr = jnp.asarray(np.stack(
                    [np.stack([f[1], f[2]], axis=-1) for f in frames]
                )).astype(jnp.float32) / 255.0
                cbcr_full = imresize(cbcr, out_shape=(meta.height, meta.width))
                rgb = to_u8(ycbcr_to_rgb(jnp.concatenate([y, cbcr_full], axis=-1)))
            sr_rgb = upscale_frames(
                model, variables, jnp.asarray(rgb), model_name, scale,
                mesh=mesh, use_pallas=use_pallas, ensemble=ensemble,
                int8=int8)
            out_ycc = to_u8(rgb_to_ycbcr(sr_rgb.astype(jnp.float32) / 255.0))
            sr_y = out_ycc[..., 0]
            cbcr_sr = ([(None, None)] * len(frames) if mono else
                       [(out_ycc[i, ..., 1], out_ycc[i, ..., 2])
                        for i in range(len(frames))])
        for i in range(len(frames)):
            wr.write(sr_y[i], *cbcr_sr[i])
            done += 1

    try:
        pending = []
        for frame in rd:
            pending.append(frame)
            if len(pending) == batch:
                flush(pending)
                pending = []
        if pending:
            flush(pending)
    finally:
        wr.close()
    return out_meta, done


def upscale_image(
    model, variables, image_u8: np.ndarray, model_name: str, scale: int,
    mesh=None, ensemble: bool = False, int8: bool = False,
) -> np.ndarray:
    """Single HWC uint8 image convenience wrapper."""
    out = upscale_frames(
        model, variables, jnp.asarray(image_u8)[None], model_name, scale, mesh,
        ensemble=ensemble, int8=int8,
    )
    return np.asarray(out[0])
