"""Pixel-shuffle goldens vs an independent index-arithmetic oracle and the
tf.depth_to_space channel-ordering contract (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def _oracle_depth_to_space(x: np.ndarray, r: int) -> np.ndarray:
    """Scalar-index oracle: out[b, h*r+i, w*r+j, c] = in[b, h, w, (i*r+j)*C+c]."""
    b, h, w, c_in = x.shape
    c = c_in // (r * r)
    out = np.zeros((b, h * r, w * r, c), dtype=x.dtype)
    for bi in range(b):
        for hh in range(h):
            for ww in range(w):
                for i in range(r):
                    for j in range(r):
                        for cc in range(c):
                            out[bi, hh * r + i, ww * r + j, cc] = x[
                                bi, hh, ww, (i * r + j) * c + cc
                            ]
    return out


@pytest.mark.parametrize("r,c", [(2, 1), (2, 3), (3, 1), (4, 2)])
def test_matches_oracle(rng, r, c):
    x = rng.random((2, 3, 5, r * r * c)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_array_equal(got, _oracle_depth_to_space(x, r))


@pytest.mark.parametrize("r", [2, 3, 4])
def test_roundtrip(rng, r):
    x = jnp.asarray(rng.random((2, 4, 6, r * r * 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pixel_unshuffle(pixel_shuffle(x, r), r)), np.asarray(x)
    )


def test_no_batch_dim(rng):
    x = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
    out = pixel_shuffle(x, 2)
    assert out.shape == (8, 8, 1)


def test_errors():
    with pytest.raises(ValueError):
        pixel_shuffle(jnp.zeros((1, 2, 2, 3)), 2)
    with pytest.raises(ValueError):
        pixel_unshuffle(jnp.zeros((1, 3, 4, 1)), 2)
