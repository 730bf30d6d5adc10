"""PSNR/SSIM goldens vs skimage-formula oracles (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.ops.metrics import psnr, quantize_u8, shave, ssim


def _psnr_oracle(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse)


def test_psnr_matches_oracle(rng):
    a = rng.random((2, 16, 16, 1))
    b = rng.random((2, 16, 16, 1))
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), quantize=False))
    want = np.array([_psnr_oracle(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-4)  # f32 MSE vs f64 oracle


def test_psnr_border_shave(rng):
    a = rng.random((12, 12, 1))
    b = a.copy()
    b[0, 0, 0] = 0.0 if b[0, 0, 0] > 0.5 else 1.0  # corrupt a border pixel
    full = float(psnr(jnp.asarray(a), jnp.asarray(b), border=0, quantize=False))
    shaved = float(psnr(jnp.asarray(a), jnp.asarray(b), border=2, quantize=False))
    assert full < 100 and shaved > 100  # identical after shave


def test_psnr_quantize_matches_uint8(rng):
    a = rng.random((8, 8, 1))
    b = rng.random((8, 8, 1))
    au = np.round(a * 255).astype(np.uint8).astype(np.float64) / 255
    bu = np.round(b * 255).astype(np.uint8).astype(np.float64) / 255
    got = float(psnr(jnp.asarray(a), jnp.asarray(b), quantize=True))
    np.testing.assert_allclose(got, _psnr_oracle(au, bu), rtol=1e-5)


def test_shave_shape():
    assert shave(jnp.zeros((4, 10, 12, 3)), 2).shape == (4, 6, 8, 3)
    assert shave(jnp.zeros((10, 12, 3)), 0).shape == (10, 12, 3)


def test_quantize_u8_idempotent(rng):
    x = jnp.asarray(rng.random((16,)))
    q = quantize_u8(x)
    np.testing.assert_allclose(np.asarray(quantize_u8(q)), np.asarray(q), atol=1e-12)


def test_ssim_self_is_one(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 1)))
    val = float(ssim(a, a, quantize=False)[0])
    assert abs(val - 1.0) < 1e-6


def test_ssim_degrades_with_noise(rng):
    a = rng.random((1, 48, 48, 1))
    small = a + rng.normal(0, 0.01, a.shape)
    large = a + rng.normal(0, 0.2, a.shape)
    s_small = float(ssim(jnp.asarray(a), jnp.asarray(np.clip(small, 0, 1)), quantize=False)[0])
    s_large = float(ssim(jnp.asarray(a), jnp.asarray(np.clip(large, 0, 1)), quantize=False)[0])
    assert s_small > s_large > 0


def test_ssim_matches_skimage_formula_oracle(rng):
    """Oracle: direct Gaussian-window SSIM in numpy (Wang et al. constants)."""
    a = rng.random((40, 40)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)

    # Independent numpy implementation with an explicit 2D Gaussian window.
    size, sigma = 11, 1.5
    g = np.exp(-((np.arange(size) - 5.0) ** 2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(x):
        out = np.zeros((x.shape[0] - size + 1, x.shape[1] - size + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(win * x[i : i + size, j : j + size])
        return out

    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a**2
    vb = filt(b * b) - mu_b**2
    vab = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    want = np.mean(
        ((2 * mu_a * mu_b + c1) * (2 * vab + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )
    got = float(ssim(jnp.asarray(a[..., None]), jnp.asarray(b[..., None]), quantize=False))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("metric", [psnr, ssim])
def test_batched_leading_dims(rng, metric):
    a = jnp.asarray(rng.random((2, 3, 24, 24, 1)))
    b = jnp.asarray(rng.random((2, 3, 24, 24, 1)))
    out = metric(a, b, quantize=False)
    assert out.shape == (2, 3)
