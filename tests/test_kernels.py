"""Pallas kernel goldens vs XLA references (interpret mode on CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.residual import (
    conv_residual_add,
    conv_residual_add_reference,
)
from ml_super_resolution_tpu.kernels.subpixel import (
    conv_pixel_shuffle,
    conv_pixel_shuffle_reference,
)


@pytest.mark.parametrize("r,cin,cout", [(2, 32, 1), (3, 16, 1), (4, 32, 3)])
def test_conv_pixel_shuffle_matches_reference(rng, r, cin, cout):
    n, h, w = 2, 16, 24
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    wgt = jnp.asarray(
        rng.standard_normal((3, 3, cin, r * r * cout)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.standard_normal((r * r * cout,)).astype(np.float32))
    want = conv_pixel_shuffle_reference(x, wgt, b, r)
    got = conv_pixel_shuffle(x, wgt, b, r, interpret=True)
    assert got.shape == (n, h * r, w * r, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_conv_pixel_shuffle_odd_height(rng):
    """non-multiple-of-8 heights are padded and cropped correctly"""
    x = jnp.asarray(rng.standard_normal((1, 10, 8, 4)).astype(np.float32))
    wgt = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.zeros((4,))
    want = conv_pixel_shuffle_reference(x, wgt, b, 2)
    got = conv_pixel_shuffle(x, wgt, b, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("cin,cout", [(64, 1), (32, 3)])
def test_conv_residual_add_matches_reference(rng, cin, cout):
    n, h, w = 2, 16, 20
    feats = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((n, h, w, cout)).astype(np.float32))
    wgt = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    want = conv_residual_add_reference(feats, skip, wgt, b)
    got = conv_residual_add(feats, skip, wgt, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_espcn_fused_matches_flax(rng, scale):
    """Fused W-lane ESPCN kernel == flax ESPCN apply (interpret mode)."""
    from ml_super_resolution_tpu.kernels.espcn_fused import (
        espcn_fused_forward,
        extract_espcn_weights,
    )
    from ml_super_resolution_tpu.models import ESPCN

    model = ESPCN(scale=scale, channels=1)
    x = jnp.asarray(rng.random((2, 20, 28, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))
    weights = extract_espcn_weights(variables["params"])
    got = np.asarray(espcn_fused_forward(weights, x, scale, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_preprocess_pairs_matches_reference(rng, scale):
    from ml_super_resolution_tpu.kernels.preprocess import (
        preprocess_pairs,
        preprocess_pairs_reference,
    )

    p = 48 if scale != 4 else 32  # divisible by scale
    x = jnp.asarray(rng.random((3, p, p, 3)).astype(np.float32))
    hr, lr = preprocess_pairs(x, scale, interpret=True)
    hr_ref, lr_ref = preprocess_pairs_reference(x, scale)
    assert hr.shape == hr_ref.shape and lr.shape == lr_ref.shape
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_ref), atol=1e-5)


def test_k2_tile_pick_respects_vmem_budget():
    """Regression for the round-2 1080p compile failure: the un-budgeted
    pick chose tile_h=32, whose (34, 64, 2048) f32 input slab is 17 MB —
    over the measured 16 MB scoped-VMEM cap.  The pick must stay within
    budget at the flagship shape (and at any shape)."""
    from ml_super_resolution_tpu.kernels.residual import (
        _VMEM_SCRATCH_BUDGET,
        _pick_tile,
    )

    # flagship: VDSR head at 1080p -> cpad=64, cout=1, wp=2048
    th = _pick_tile(1080, 64, 1, 2048)
    assert th < 32, "tile_h=32 cannot fit the 16 MB scoped-VMEM cap at 1080p"
    for h, cpad, cout, wp in [
        (1080, 64, 1, 2048),   # 1080p VDSR head
        (2160, 64, 1, 4096),   # 4K VDSR head
        (540, 64, 3, 1024),    # RGB head, 540p
        (16, 64, 1, 256),      # small eval tiles
    ]:
        th = _pick_tile(h, cpad, cout, wp)
        scratch = ((th + 2) * cpad + 2 * th * cout) * wp * 4
        assert scratch <= _VMEM_SCRATCH_BUDGET, (h, cpad, cout, wp, th)


def test_k2_explicit_tile_h_golden(rng):
    """tile_h is honored when passed explicitly (used by the AOT probe)."""
    feats = jnp.asarray(rng.standard_normal((1, 24, 20, 16)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((1, 24, 20, 1)).astype(np.float32))
    wgt = jnp.asarray(rng.standard_normal((3, 3, 16, 1)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    want = conv_residual_add_reference(feats, skip, wgt, b)
    for th in (8, 24):
        got = conv_residual_add(feats, skip, wgt, b, tile_h=th, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
