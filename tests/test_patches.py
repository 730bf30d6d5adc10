"""On-device data pipeline (K3 XLA baseline) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.ops.patches import (
    eval_pair,
    random_hr_patches,
    training_pairs,
)


def test_random_patches_shapes_and_grid_alignment(rng):
    tiles = jnp.asarray(rng.random((8, 64, 64, 3)).astype(np.float32))
    key = jax.random.key(0)
    patches = random_hr_patches(key, tiles, patch_size=24, scale=3, augment=False)
    assert patches.shape == (8, 24, 24, 3)
    # Every patch must be an exact sub-window of its tile on the scale grid.
    t0 = np.asarray(tiles[0])
    p0 = np.asarray(patches[0])
    found = False
    for y in range(0, 64 - 24 + 1, 3):
        for x in range(0, 64 - 24 + 1, 3):
            if np.array_equal(t0[y : y + 24, x : x + 24], p0):
                found = True
    assert found


def test_augment_preserves_content_statistics(rng):
    tiles = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    p = random_hr_patches(jax.random.key(1), tiles, 32, 1, augment=True)
    # patch == whole tile, so augmentation is a permutation of pixels:
    np.testing.assert_allclose(
        np.sort(np.asarray(p).ravel()), np.sort(np.asarray(tiles).ravel()), atol=0
    )


@pytest.mark.parametrize("lr_space", [True, False])
def test_training_pairs_shapes(rng, lr_space):
    tiles = jnp.asarray((rng.random((4, 96, 96, 3)) * 255).astype(np.uint8))
    lr, hr = training_pairs(
        jax.random.key(0), tiles, patch_size=48, scale=4, y_only=True, lr_space=lr_space
    )
    assert hr.shape == (4, 48, 48, 1)
    assert lr.shape == ((4, 12, 12, 1) if lr_space else (4, 48, 48, 1))
    assert lr.dtype == jnp.float32


def test_training_pairs_deterministic_per_key(rng):
    tiles = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    a = training_pairs(jax.random.key(7), tiles, patch_size=32, scale=2)
    b = training_pairs(jax.random.key(7), tiles, patch_size=32, scale=2)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = training_pairs(jax.random.key(8), tiles, patch_size=32, scale=2)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_eval_pair_crops_to_scale_grid(rng):
    hr = jnp.asarray(rng.random((37, 41, 3)).astype(np.float32))
    lr, hr_c = eval_pair(hr, scale=3, y_only=True, lr_space=True)
    assert hr_c.shape == (36, 39, 1)
    assert lr.shape == (12, 13, 1)
    lr2, hr2 = eval_pair(hr, scale=3, y_only=False, lr_space=False)
    assert hr2.shape == (36, 39, 3)
    assert lr2.shape == (36, 39, 3)


def test_multiscale_training_pairs(rng):
    from ml_super_resolution_tpu.ops.patches import training_pairs_multiscale

    tiles = jnp.asarray(rng.random((6, 96, 96, 3)).astype(np.float32))
    lr, hr = training_pairs_multiscale(
        jax.random.key(0), tiles, patch_size=48, scales=(2, 3, 4), y_only=True
    )
    assert lr.shape == hr.shape == (6, 48, 48, 1)
    # degraded inputs differ from targets but correlate strongly
    d = np.asarray(jnp.mean(jnp.square(lr - hr), axis=(1, 2, 3)))
    assert (d > 1e-6).all()
    # deterministic
    lr2, _ = training_pairs_multiscale(
        jax.random.key(0), tiles, patch_size=48, scales=(2, 3, 4), y_only=True
    )
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lr2))


def test_tile_loader_cache_speeds_second_epoch():
    import time

    from ml_super_resolution_tpu.data.datasets import SyntheticImages
    from ml_super_resolution_tpu.data.loader import TileLoader

    ds = SyntheticImages(n=16, size=128, seed=2)
    with TileLoader(ds, batch_size=16, tile_size=96, num_workers=1,
                    patches_per_tile=1) as loader:
        it = iter(loader)
        next(it)  # first epoch decodes
        t0 = time.perf_counter()
        next(it)  # second epoch from cache
        t_cached = time.perf_counter() - t0
        assert loader._cache  # populated
    assert t_cached < 5.0  # generous; mostly asserting it didn't re-render
