"""Golden tests for BT.601 studio-swing YCbCr (SURVEY §4 unit goldens)."""

import jax.numpy as jnp
import numpy as np

from ml_super_resolution_tpu.ops.color import rgb_to_y, rgb_to_ycbcr, ycbcr_to_rgb


def test_known_values():
    # Matlab rgb2ycbcr([1 1 1]) = [235 128 128]/255; black = [16 128 128]/255.
    white = rgb_to_ycbcr(jnp.ones((1, 1, 3), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(white).ravel(), np.array([235.0, 128.0, 128.0]) / 255.0, atol=1e-6
    )
    black = rgb_to_ycbcr(jnp.zeros((1, 1, 3), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(black).ravel(), np.array([16.0, 128.0, 128.0]) / 255.0, atol=1e-6
    )
    # Pure red, Matlab: rgb2ycbcr([1 0 0]) -> [81.481 90.203 240]/255
    red = rgb_to_ycbcr(jnp.asarray([[[1.0, 0.0, 0.0]]], jnp.float64))
    np.testing.assert_allclose(
        np.asarray(red).ravel(),
        np.array([81.481, 90.203, 240.0]) / 255.0,
        atol=1e-6,
    )


def test_roundtrip(rng):
    rgb = jnp.asarray(rng.random((4, 7, 5, 3)))
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-10)


def test_y_channel_matches_full(rng):
    rgb = jnp.asarray(rng.random((3, 8, 8, 3)))
    y = rgb_to_y(rgb)
    full = rgb_to_ycbcr(rgb)
    np.testing.assert_allclose(np.asarray(y[..., 0]), np.asarray(full[..., 0]), atol=1e-12)
    assert y.shape == (3, 8, 8, 1)


def test_luma_range(rng):
    rgb = jnp.asarray(rng.random((64, 3)))
    y = rgb_to_y(rgb)
    assert float(y.min()) >= 16 / 255 - 1e-9
    assert float(y.max()) <= 235 / 255 + 1e-9
