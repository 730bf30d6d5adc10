"""Composed-glue goldens (kernels/apply.py edsr_composed_forward).

The EDSR upsample+tail glue is linear (no activations in the stages,
models/edsr.py), so it composes exactly into one LR conv + per-channel
bias, with the border band recomputed by the staged glue (SAME zero-pad
truncation does not commute with composition).  These goldens pin:

* composed == model.apply on frames large enough for strips (every scale),
* composed == staged fold (the previous default route) to the same tol,
* the small-frame fallback (strips impossible) still matches,
* the packed variant matches per-frame outputs,
* kernel-composition algebra in isolation (interior of random convs).

Why this exists: trunk-gap probes (runs/probe_trunk_gap.err) measured the
staged glue at 31.06 ms of the flagship's 90.3 ms frame (102 vs the
trunk's 168 TFLOP/s); composition cuts its FLOPs ~20x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.apply import (
    _STRIP_HALO,
    compose_conv_kernels,
    edsr_composed_forward,
    edsr_composed_packed_forward,
    edsr_folded_forward,
    pack_blockdiag_params,
)
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.utils.config import ModelConfig


def _init(scale, channels=3, overrides=None, hw=(20, 18), batch=2, seed=0):
    ov = {"num_blocks": 2, "features": 8}
    ov.update(overrides or {})
    m = build_model(ModelConfig(name="edsr", scale=scale, channels=channels,
                                overrides=ov))
    x = jnp.asarray(np.random.default_rng(seed).random(
        (batch, *hw, channels)), jnp.float32)
    v = m.init(jax.random.key(seed), x[:1], train=False)
    return m, v, x


def test_compose_conv_kernels_interior():
    """corr(corr(y, ka), kb) == corr(y, compose(ka, kb)) away from borders
    (VALID interior of a zero-pad SAME chain)."""
    rng = np.random.default_rng(1)
    ka = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    kb = jnp.asarray(rng.standard_normal((3, 3, 6, 5)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16, 14, 4)), jnp.float32)

    def corr(img, k):
        dn = jax.lax.conv_dimension_numbers(
            img.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            img, k, (1, 1), "SAME", dimension_numbers=dn)

    staged = corr(corr(y, ka), kb)
    comp = corr(y, compose_conv_kernels(ka, kb))
    assert compose_conv_kernels(ka, kb).shape == (5, 5, 4, 5)
    np.testing.assert_allclose(np.asarray(staged[0, 2:-2, 2:-2]),
                               np.asarray(comp[0, 2:-2, 2:-2]),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_composed_matches_model_apply(scale):
    hw = (8 * _STRIP_HALO, 8 * _STRIP_HALO + 2)  # strips active
    m, v, x = _init(scale, hw=hw)
    ref = m.apply(v, x, train=False)
    out = edsr_composed_forward(v["params"], x, scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("scale", [2, 4])
def test_composed_matches_staged_fold(scale):
    m, v, x = _init(scale, hw=(14, 30), seed=3,
                    overrides={"res_scale": 0.5})
    staged = edsr_folded_forward(v["params"], x, scale, res_scale=0.5)
    comp = edsr_composed_forward(v["params"], x, scale, res_scale=0.5)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(staged),
                               atol=2e-5, rtol=1e-4)


def test_small_frame_fallback():
    # below the 4*_STRIP_HALO strip threshold -> staged glue outright
    m, v, x = _init(4, hw=(10, 9), seed=4)
    ref = m.apply(v, x, train=False)
    out = edsr_composed_forward(v["params"], x, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_composed_packed_matches_per_frame():
    m, v, x = _init(4, hw=(14, 26), batch=4, seed=5)
    per = edsr_composed_forward(v["params"], x, 4)
    pp = pack_blockdiag_params(v["params"], reps=2, scale=4)
    packed = edsr_composed_packed_forward(pp, x, 4, reps=2)
    assert packed.shape == per.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(per),
                               atol=2e-5, rtol=1e-4)


def test_composed_bf16_runs():
    m, v, x = _init(4, hw=(14, 14), batch=1, seed=6)
    out = edsr_composed_forward(v["params"], x, 4, dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    ref = m.apply(v, x, train=False)
    # bf16 trunk: loose agreement only (same bound as the folded bf16 route)
    assert float(jnp.abs(out - ref).max()) < 0.1


def test_composed_tiled_equals_whole():
    """Band-tiled edsr (composed default route) == whole-frame bitwise: the
    staged border strips inside a shard only touch the halo region that
    tiling crops, so kept interiors are composed-conv values in both."""
    from ml_super_resolution_tpu.infer import upscale_frames
    from ml_super_resolution_tpu.parallel.mesh import make_mesh

    m, v, _ = _init(2, hw=(16, 16))
    frames = jnp.asarray(
        (np.random.default_rng(9).random((1, 64, 26, 3)) * 255)
        .astype(np.uint8))
    whole = np.asarray(upscale_frames(m, v, frames, "edsr", 2, mesh=None))
    tiled = np.asarray(upscale_frames(m, v, frames, "edsr", 2,
                                      mesh=make_mesh(sp=2)))
    np.testing.assert_array_equal(tiled, whole)


def test_default_edsr_route_gates(monkeypatch):
    """infer.py's measured size gates (runs/probe_composed.err): even
    batches -> composed+packed (features < 128); odd small-trunk batches
    -> folded (strip overhead loses); odd wide-trunk (features >= 128) ->
    composed unpacked; SR_COMPOSED_TAIL=0 restores staged everywhere."""
    import ml_super_resolution_tpu.kernels.apply as A
    from ml_super_resolution_tpu.infer import upscale_frames

    monkeypatch.delenv("SR_COMPOSED_TAIL", raising=False)
    monkeypatch.delenv("SR_LANE_PACK", raising=False)
    comp, pcomp = [], []
    realc = A.edsr_composed_forward
    realp = A.edsr_composed_packed_forward
    monkeypatch.setattr(
        A, "edsr_composed_forward",
        lambda *a, **k: (comp.append(1), realc(*a, **k))[1])
    monkeypatch.setattr(
        A, "edsr_composed_packed_forward",
        lambda *a, **k: (pcomp.append(1), realp(*a, **k))[1])

    m, v, _ = _init(2, hw=(16, 14))   # features=8 (small trunk)
    fr2 = jnp.asarray(
        (np.random.default_rng(7).random((2, 16, 14, 3)) * 255)
        .astype(np.uint8))
    ref = np.asarray(upscale_frames(m, v, fr2, "edsr", 2))
    assert pcomp, "even batch must route composed+packed"

    # (edsr_composed_packed_forward calls edsr_composed_forward inside,
    # so `comp` fires alongside `pcomp` — reset both between cases)
    comp.clear(); pcomp.clear()
    np.asarray(upscale_frames(m, v, fr2[:1], "edsr", 2))
    assert not comp and not pcomp, \
        "odd small-trunk batch must stay on the folded route"

    mw, vw, _ = _init(2, hw=(16, 14), overrides={"features": 128})
    np.asarray(upscale_frames(mw, vw, fr2[:1], "edsr", 2))
    assert comp, "odd wide-trunk batch must route composed unpacked"

    comp.clear(); pcomp.clear()
    monkeypatch.setenv("SR_COMPOSED_TAIL", "0")
    off = np.asarray(upscale_frames(m, v, fr2, "edsr", 2))
    assert not comp and not pcomp
    assert np.abs(off.astype(int) - ref.astype(int)).max() <= 1
