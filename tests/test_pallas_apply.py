"""--pallas inference routing parity: K1/K2 forwards == flax model.apply.

CPU runs the kernels in interpreter mode (exact f32 math), so parity here is
tight; on-device validation numbers live in RESULTS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.apply import (
    pallas_apply_fn,
    srresnet_pallas_forward,
    vdsr_pallas_forward,
)
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.utils.config import ModelConfig


def _init(name, scale, channels, h=20, w=28, overrides=None):
    m = build_model(
        ModelConfig(name=name, scale=scale, channels=channels,
                    overrides=overrides or {})
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((2, h, w, channels)), jnp.float32
    )
    v = m.init(jax.random.key(1), x[:1], train=False)
    return m, v, x


def test_vdsr_pallas_forward_matches_flax():
    m, v, x = _init("vdsr", 4, 1, overrides={"depth": 6})
    ref = m.apply(v, x, train=False)
    out = vdsr_pallas_forward(v["params"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_srresnet_pallas_forward_matches_flax(scale):
    m, v, x = _init("srresnet", scale, 3, h=12, w=16,
                    overrides={"num_blocks": 2})
    ref = m.apply(v, x, train=False)
    out = srresnet_pallas_forward(
        v["params"], v.get("batch_stats", {}), x, scale
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_srresnet_no_bn_variant():
    m, v, x = _init("srresnet", 2, 3, h=10, w=10,
                    overrides={"num_blocks": 2, "use_bn": False})
    ref = m.apply(v, x, train=False)
    out = srresnet_pallas_forward(v["params"], {}, x, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_apply_fn_routing():
    # Round-5 vdsr --pallas routing (decision record in kernels/apply.py):
    # even batches -> packed-XLA bf16 (64.4 MP/s on chip); odd batches ->
    # the whole-net fused kernel (44.1, still beats XLA-bf16's 42.6 where
    # packing can't apply).  Both are bf16-class -> loose tolerance.
    m, v, x = _init("vdsr", 2, 1, overrides={"depth": 4})
    fn = pallas_apply_fn("vdsr", v, 2)
    assert fn is not None
    ref = np.asarray(m.apply(v, x, train=False))
    err = np.abs(np.asarray(fn(x)) - ref)            # even: packed route
    assert float(err.max()) < 2e-2
    err1 = np.abs(np.asarray(fn(x[:1])) - ref[:1])   # odd: fused kernel
    assert float(err1.max()) < 2e-2
    assert pallas_apply_fn("srcnn", v, 2) is None  # no fused path -> flax


def test_pallas_apply_fn_vdsr_fused_optout(monkeypatch):
    # SR_VDSR_FUSED=0: odd batches fall back to the K2 fused residual head
    # (f32-exact); even batches still take the packed-XLA bf16 route.
    m, v, x = _init("vdsr", 2, 1, overrides={"depth": 4})
    monkeypatch.setenv("SR_VDSR_FUSED", "0")
    fn = pallas_apply_fn("vdsr", v, 2)
    ref = np.asarray(m.apply(v, x, train=False))
    np.testing.assert_allclose(np.asarray(fn(x[:1])), ref[:1], atol=2e-5)
    assert float(np.abs(np.asarray(fn(x)) - ref).max()) < 2e-2


def test_upscale_frames_pallas_vdsr_matches_default(monkeypatch):
    """The product surface, K2-head route (SR_VDSR_FUSED=0): --pallas output
    == default output (uint8 exact modulo rounding at the quantization
    boundary)."""
    from ml_super_resolution_tpu.infer import upscale_frames

    monkeypatch.setenv("SR_VDSR_FUSED", "0")
    m, v, _ = _init("vdsr", 2, 1, overrides={"depth": 4})
    frames = (np.random.default_rng(3).random((1, 18, 22, 3)) * 255).astype(
        np.uint8
    )
    a = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "vdsr", 2, use_pallas=False)
    )
    b = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "vdsr", 2, use_pallas=True)
    )
    # the K2 head is f32: identical math up to f32 association; allow 1
    # uint8 step at quantization boundaries.
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1
    assert (a != b).mean() < 0.01


def test_upscale_frames_pallas_vdsr_fused_default_close():
    """Default --pallas vdsr route (whole-net fused, bf16 operands): output
    within a few uint8 steps of the f32 XLA path."""
    from ml_super_resolution_tpu.infer import upscale_frames

    m, v, _ = _init("vdsr", 2, 1, overrides={"depth": 4})
    frames = (np.random.default_rng(3).random((1, 18, 22, 3)) * 255).astype(
        np.uint8
    )
    a = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "vdsr", 2, use_pallas=False)
    )
    b = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "vdsr", 2, use_pallas=True)
    )
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 5  # bf16 activation rounding, PSNR-irrelevant
    assert d.mean() < 1.0


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_srresnet_folded_tail_matches_flax(scale):
    """Folded-tail inference (tail conv computed pre-shuffle; kernels/apply.py
    fold_tail_weights) == flax apply to f32 tolerance."""
    from ml_super_resolution_tpu.kernels.apply import srresnet_folded_forward

    m = build_model(ModelConfig(name="srresnet", scale=scale, channels=3,
                                overrides={"num_blocks": 2}))
    x = jnp.asarray(np.random.default_rng(2).random((1, 20, 24, 3)), jnp.float32)
    v = m.init(jax.random.key(2), x, train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    out = np.asarray(srresnet_folded_forward(
        v["params"], v.get("batch_stats", {}), x, scale))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_upscale_frames_default_srresnet_route_is_folded(monkeypatch):
    """The default srresnet upscale path is the folded-tail recast; it must
    match the plain flax route (SR_FOLDED_TAIL=0) to uint8 rounding."""
    from ml_super_resolution_tpu.infer import upscale_frames

    m, v, _ = _init("srresnet", 4, 3, overrides={"num_blocks": 2})
    frames = (np.random.default_rng(4).random((1, 16, 20, 3)) * 255).astype(
        np.uint8
    )
    folded = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "srresnet", 4)
    )
    monkeypatch.setenv("SR_FOLDED_TAIL", "0")
    flax = np.asarray(
        upscale_frames(m, v, jnp.asarray(frames), "srresnet", 4)
    )
    assert np.abs(folded.astype(int) - flax.astype(int)).max() <= 1


@pytest.mark.parametrize("scale,res_scale", [(2, 1.0), (3, 1.0), (4, 0.1)])
def test_edsr_folded_tail_matches_flax(scale, res_scale):
    """EDSR folded-tail inference == flax apply (incl. the r=3 fold, which
    needs the kernel zero-pad to keep the pre-shuffle kernel symmetric)."""
    from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward

    m = build_model(ModelConfig(name="edsr", scale=scale, channels=3,
                                overrides={"num_blocks": 2,
                                           "res_scale": res_scale}))
    x = jnp.asarray(np.random.default_rng(5).random((1, 12, 14, 3)),
                    jnp.float32)
    v = m.init(jax.random.key(5), x, train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    out = np.asarray(edsr_folded_forward(v["params"], x, scale,
                                         res_scale=res_scale))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_upscale_frames_pallas_flag_models_without_fused_path():
    """--pallas with a model that has no fused kernel (srcnn) must fall back
    to the flax forward, not crash (regression: the routing refactor once
    returned None as the apply_fn)."""
    from ml_super_resolution_tpu.infer import upscale_frames

    m, v, _ = _init("srcnn", 2, 1)
    frames = (np.random.default_rng(6).random((1, 14, 18, 3)) * 255).astype(
        np.uint8
    )
    a = np.asarray(upscale_frames(m, v, jnp.asarray(frames), "srcnn", 2,
                                  use_pallas=True))
    b = np.asarray(upscale_frames(m, v, jnp.asarray(frames), "srcnn", 2))
    np.testing.assert_array_equal(a, b)
