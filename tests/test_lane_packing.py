"""Lane-packing goldens (kernels/apply.py pack_blockdiag_params):

packed-frames inference must equal per-frame inference exactly up to float
summation noise — every inserted weight is an exact zero, so the only
differences are XLA reassociation across the wider channel axis.

Why this exists: MFU probes (runs/probe_mfu.err) measured 64-feature trunk
convs at ~59-64 TFLOP/s (half the MXU's 128 lanes idle) while the same
useful work packed 2-frames-into-channels ran at 97.6 TFLOP/s.  The packing
is only legal if the math is unchanged — these goldens pin that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.apply import (
    edsr_folded_forward,
    edsr_folded_packed_forward,
    pack_blockdiag_params,
    srresnet_folded_forward,
    srresnet_folded_packed_forward,
    vdsr_packed_forward,
)
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.utils.config import ModelConfig


def _init(name, scale, channels, overrides=None, hw=(12, 10), batch=4):
    m = build_model(ModelConfig(name=name, scale=scale, channels=channels,
                                overrides=dict(overrides or {})))
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, *hw, channels)), jnp.float32)
    v = m.init(jax.random.key(1), x[:1], train=False)
    return m, v, x


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.slow
def test_edsr_packed_matches_folded(scale):
    m, v, x = _init("edsr", scale, 3,
                    overrides={"num_blocks": 3, "features": 8})
    ref = edsr_folded_forward(v["params"], x, scale)
    pp = pack_blockdiag_params(v["params"], reps=2, scale=scale)
    out = edsr_folded_packed_forward(pp, x, scale, reps=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_srresnet_packed_matches_folded():
    m, v, x = _init("srresnet", 4, 3)
    stats = v.get("batch_stats", {})
    ref = srresnet_folded_forward(v["params"], stats, x, 4)
    pp = pack_blockdiag_params(v["params"], reps=2, scale=4)
    ps = pack_blockdiag_params(stats, reps=2, scale=4)
    out = srresnet_folded_packed_forward(pp, ps, x, 4, reps=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_vdsr_packed_matches_model_apply():
    m, v, x = _init("vdsr", 2, 1, hw=(16, 14), batch=2)
    ref = m.apply(v, x, train=False)
    pp = pack_blockdiag_params(v["params"], reps=2)
    out = vdsr_packed_forward(pp, x, reps=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pack_rejects_nothing_silently():
    # a packed tree keeps exactly the structure of the input tree
    m, v, _ = _init("edsr", 4, 3, overrides={"num_blocks": 2, "features": 8})
    pp = pack_blockdiag_params(v["params"], reps=2, scale=4)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(v["params"])}
    new_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(pp)}
    assert ref_paths == new_paths


def test_sr_lane_pack_route_is_byte_identical(monkeypatch):
    """SR_LANE_PACK=1 routes upscale_frames through the packed forwards;
    the uint8 output must be byte-identical to the default route."""
    from ml_super_resolution_tpu.infer import upscale_frames

    m, v, _ = _init("edsr", 2, 3, overrides={"num_blocks": 2, "features": 8})
    frames = jnp.asarray(
        (np.random.default_rng(3).random((4, 20, 18, 3)) * 255).astype(np.uint8))
    base = np.asarray(upscale_frames(m, v, frames, "edsr", 2))
    monkeypatch.setenv("SR_LANE_PACK", "1")
    packed = np.asarray(upscale_frames(m, v, frames, "edsr", 2))
    assert packed.shape == base.shape
    np.testing.assert_array_equal(packed, base)

    # odd batch falls back to the unpacked route (still correct)
    odd = np.asarray(upscale_frames(m, v, frames[:3], "edsr", 2))
    np.testing.assert_array_equal(odd, base[:3])


def test_default_routing_table(monkeypatch):
    """The measured per-model decision table (infer._LANE_PACK_DEFAULT,
    BENCH_r04.json + runs/bench_r5_preview.err): vdsr and edsr even-batch
    default to the packed route with NO env var; SR_LANE_PACK=0
    force-disables it (≤1 uint8 step from reassociation); srresnet stays
    unpacked (its packed-b2 row loses to b1)."""
    import ml_super_resolution_tpu.kernels.apply as A
    from ml_super_resolution_tpu.infer import upscale_frames

    monkeypatch.delenv("SR_LANE_PACK", raising=False)
    calls = []
    real = A.vdsr_packed_forward
    monkeypatch.setattr(
        A, "vdsr_packed_forward",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    m, v, _ = _init("vdsr", 2, 1, hw=(16, 14), batch=2)
    frames = jnp.asarray(
        (np.random.default_rng(5).random((2, 16, 14, 3)) * 255)
        .astype(np.uint8))
    ref = np.asarray(upscale_frames(m, v, frames, "vdsr", 2))
    assert calls, "vdsr even batch must default to the packed route"

    calls.clear()
    monkeypatch.setenv("SR_LANE_PACK", "0")
    off = np.asarray(upscale_frames(m, v, frames, "vdsr", 2))
    assert not calls, "SR_LANE_PACK=0 must force the plain route"
    # packed conv sums reassociate across the widened channel axis, so a
    # value sitting exactly on a .5 rounding boundary may flip one step
    assert np.abs(off.astype(int) - ref.astype(int)).max() <= 1

    monkeypatch.delenv("SR_LANE_PACK", raising=False)
    calls2 = []
    reale = A.edsr_composed_packed_forward
    monkeypatch.setattr(
        A, "edsr_composed_packed_forward",
        lambda *a, **k: (calls2.append(1), reale(*a, **k))[1])
    me, ve, _ = _init("edsr", 2, 3, overrides={"num_blocks": 2, "features": 8})
    ef = jnp.asarray(
        (np.random.default_rng(6).random((2, 16, 14, 3)) * 255)
        .astype(np.uint8))
    np.asarray(upscale_frames(me, ve, ef, "edsr", 2))
    assert calls2, "edsr even batch must default to composed+packed"

    calls3 = []
    reals = A.srresnet_folded_packed_forward
    monkeypatch.setattr(
        A, "srresnet_folded_packed_forward",
        lambda *a, **k: (calls3.append(1), reals(*a, **k))[1])
    ms, vs, _ = _init("srresnet", 2, 3, overrides={"num_blocks": 2})
    sf = jnp.asarray(
        (np.random.default_rng(8).random((2, 16, 14, 3)) * 255)
        .astype(np.uint8))
    np.asarray(upscale_frames(ms, vs, sf, "srresnet", 2))
    assert not calls3, "srresnet default route must stay unpacked"
