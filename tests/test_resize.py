"""Golden tests for the Matlab-convention bicubic (SURVEY §7: parity dies here).

Oracle strategy: an independent scalar-loop reimplementation of Matlab
imresize's contribution algorithm (written against the published algorithm,
not shared code paths with the op), plus PIL cross-checks for interior pixels
and structural invariants.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ml_super_resolution_tpu.ops.resize import (
    cubic_kernel,
    imresize,
    resize_kernel_matrix,
)


def _matlab_imresize_1d_oracle(signal: np.ndarray, out_size: int, antialias=True):
    """Scalar-loop Matlab imresize along axis 0 (independent oracle)."""
    in_size = signal.shape[0]
    s = out_size / in_size
    width = 4.0 if (s >= 1 or not antialias) else 4.0 / s
    out = np.zeros((out_size,) + signal.shape[1:], dtype=np.float64)
    for i in range(out_size):
        u = (i + 0.5) / s - 0.5
        left = int(np.floor(u - width / 2))
        total_w = 0.0
        acc = np.zeros(signal.shape[1:], dtype=np.float64)
        for k in range(left, left + int(np.ceil(width)) + 2):
            d = u - k
            if s < 1 and antialias:
                wgt = s * float(cubic_kernel(np.array([s * d]))[0])
            else:
                wgt = float(cubic_kernel(np.array([d]))[0])
            acc += wgt * signal[min(max(k, 0), in_size - 1)]
            total_w += wgt
        out[i] = acc / total_w
    return out


@pytest.mark.parametrize("in_size,out_size", [(12, 24), (24, 12), (33, 11), (10, 30), (17, 5)])
def test_matrix_matches_scalar_oracle(rng, in_size, out_size):
    sig = rng.random((in_size, 3))
    mat = resize_kernel_matrix(in_size, out_size)
    got = mat @ sig
    want = _matlab_imresize_1d_oracle(sig, out_size)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_downsample_rows_sum_to_one(scale):
    mat = resize_kernel_matrix(96, 96 // scale)
    np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-12)


def test_constant_image_preserved(rng):
    img = jnp.full((1, 32, 40, 3), 0.437, jnp.float64)
    for scale in (0.25, 1 / 3, 0.5, 2.0, 3.0):
        out = imresize(img, scale=scale)
        np.testing.assert_allclose(np.asarray(out), 0.437, atol=1e-10)


def test_identity_at_scale_one(rng):
    img = jnp.asarray(rng.random((2, 16, 16, 1)))
    out = imresize(img, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-12)


def test_separable_2d_matches_sequential_1d(rng):
    img = rng.random((20, 24, 3))
    out = imresize(jnp.asarray(img), scale=0.5)
    tmp = _matlab_imresize_1d_oracle(img, 10)  # rows
    want = _matlab_imresize_1d_oracle(tmp.transpose(1, 0, 2), 12).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-10)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_downsample_close_to_pil_interior(rng, scale):
    """PIL's antialiased bicubic uses the same a=-0.5 kernel; interiors agree
    to float error (edge handling differs slightly)."""
    h = w = 24 * scale
    img = (rng.random((h, w)) * 255).astype(np.float32)
    ours = np.asarray(imresize(jnp.asarray(img)[..., None], scale=1.0 / scale))[..., 0]
    pil = np.asarray(
        Image.fromarray(img, mode="F").resize((w // scale, h // scale), Image.BICUBIC)
    )
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(ours[interior], pil[interior], atol=5e-4)


def test_upsample_close_to_pil_interior(rng):
    img = (rng.random((16, 16)) * 255).astype(np.float32)
    ours = np.asarray(imresize(jnp.asarray(img)[..., None], scale=4.0))[..., 0]
    pil = np.asarray(Image.fromarray(img, mode="F").resize((64, 64), Image.BICUBIC))
    interior = (slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(ours[interior], pil[interior], atol=5e-4)


def test_out_shape_argument(rng):
    img = jnp.asarray(rng.random((1, 15, 17, 3)))
    out = imresize(img, out_shape=(30, 51))
    assert out.shape == (1, 30, 51, 3)


def test_antialias_off_differs_on_downsample(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 1)))
    a = np.asarray(imresize(img, scale=0.5, antialias=True))
    b = np.asarray(imresize(img, scale=0.5, antialias=False))
    assert np.abs(a - b).max() > 1e-4


def test_jit_and_batch(rng):
    import jax

    img = jnp.asarray(rng.random((4, 12, 12, 3)), dtype=jnp.float32)
    f = jax.jit(lambda x: imresize(x, scale=2.0))
    out = f(img)
    assert out.shape == (4, 24, 24, 3)
    ref = imresize(img, scale=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
