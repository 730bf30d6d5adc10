"""On-device patch extraction, augmentation, and bicubic degradation (K3).

The reference's training data path was a per-step host loop: PIL load ->
RGB->YCbCr -> random HR crop -> bicubic downsample -> feed_dict
(BASELINE.json:5, SURVEY §3.1).  That loop is the single biggest structural
perf difference the rebuild eliminates: the host only *decodes* images into
fixed-size HR tiles; everything per-step — random crop, flip/rot augmentation,
Matlab-bicubic degradation, YCbCr/Y extraction — happens here, inside the
jitted train step, so one XLA program consumes raw HR tiles straight from HBM.

Everything is shape-static (patch size, scale, tile size are Python ints) and
uses ``lax`` control flow only, so it fuses into the surrounding step under
``jit`` and shards over the batch axis with no host sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ml_super_resolution_tpu.ops.color import rgb_to_y, rgb_to_ycbcr
from ml_super_resolution_tpu.ops.resize import imresize

__all__ = ["random_hr_patches", "degrade", "training_pairs"]


def _augment_one(img: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Dihedral-group augmentation of a square HWC patch; ``code`` in [0, 8)."""
    img = jnp.where(code & 1, img[::-1, :, :], img)  # vertical flip
    img = jnp.where(code & 2, img[:, ::-1, :], img)  # horizontal flip
    return jnp.where(code & 4, jnp.swapaxes(img, 0, 1), img)  # transpose


def random_hr_patches(
    key: jax.Array,
    hr_tiles: jnp.ndarray,
    patch_size: int,
    scale: int,
    augment: bool = True,
) -> jnp.ndarray:
    """Random ``patch_size``² crops (+ dihedral augment) from ``(N, H, W, C)`` tiles.

    Crop origins are aligned to the ``scale`` grid so the LR/HR pixel
    correspondence after ×``1/scale`` downsampling is exact.
    """
    n, h, w, _ = hr_tiles.shape
    k_y, k_x, k_aug = jax.random.split(key, 3)
    max_y = (h - patch_size) // scale + 1
    max_x = (w - patch_size) // scale + 1
    ys = jax.random.randint(k_y, (n,), 0, max_y) * scale
    xs = jax.random.randint(k_x, (n,), 0, max_x) * scale
    codes = (
        jax.random.randint(k_aug, (n,), 0, 8)
        if augment
        else jnp.zeros((n,), jnp.int32)
    )

    def crop_one(img, y, x, code):
        patch = jax.lax.dynamic_slice(
            img, (y, x, 0), (patch_size, patch_size, img.shape[-1])
        )
        return _augment_one(patch, code)

    return jax.vmap(crop_one)(hr_tiles, ys, xs, codes)


def degrade(hr: jnp.ndarray, scale: int, antialias: bool = True) -> jnp.ndarray:
    """Matlab-bicubic ×``1/scale`` degradation of ``(..., H, W, C)`` HR images."""
    return imresize(hr, scale=1.0 / scale, antialias=antialias)


@partial(
    jax.jit,
    static_argnames=("patch_size", "scale", "y_only", "lr_space", "augment"),
)
def training_pairs(
    key: jax.Array,
    hr_tiles: jnp.ndarray,
    patch_size: int,
    scale: int,
    y_only: bool = True,
    lr_space: bool = True,
    augment: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full on-device pipeline: HR tiles -> (input, target) training pairs.

    ``hr_tiles``: ``(N, H, W, 3)`` uint8 or [0,1] float RGB.
    ``y_only``: train on luma (SRCNN/ESPCN/VDSR protocol) vs RGB (SRGAN).
    ``lr_space``: if True the input stays at LR resolution (ESPCN/SRResNet);
    if False it is bicubic-upscaled back to HR size first (SRCNN/VDSR).

    Returns ``(inputs, targets)`` with a compiled cost of one fused XLA
    program; zero host round-trips (SURVEY §3.5).
    """
    if hr_tiles.dtype == jnp.uint8:
        hr_tiles = hr_tiles.astype(jnp.float32) / 255.0
    hr = random_hr_patches(key, hr_tiles, patch_size, scale, augment)
    if y_only:
        hr = rgb_to_y(hr)
    lr = degrade(hr, scale)
    if not lr_space:
        lr = imresize(lr, scale=float(scale), out_shape=None)
    return lr, hr


@partial(
    jax.jit,
    static_argnames=("patch_size", "scales", "y_only", "augment"),
)
def training_pairs_multiscale(
    key: jax.Array,
    hr_tiles: jnp.ndarray,
    patch_size: int,
    scales: tuple[int, ...],
    y_only: bool = True,
    augment: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-scale pairs for pre-upscale models (VDSR protocol, arXiv:1511.04587 §4.2).

    One network is trained jointly over ``scales``: each example in the batch
    draws a scale, is bicubic-degraded by it, and re-upscaled to HR size, so
    inputs keep one static shape while mixing all scales in every batch —
    ``lax.switch`` over per-scale branches, vmapped over the batch.
    """
    if hr_tiles.dtype == jnp.uint8:
        hr_tiles = hr_tiles.astype(jnp.float32) / 255.0
    k_crop, k_scale = jax.random.split(key)
    # crop on the grid of the largest scale so all branches stay aligned
    hr = random_hr_patches(k_crop, hr_tiles, patch_size, max(scales), augment)
    if y_only:
        hr = rgb_to_y(hr)
    idx = jax.random.randint(k_scale, (hr.shape[0],), 0, len(scales))

    def degrade_one(img, i):
        branches = [
            (lambda im, s=s: imresize(
                imresize(im, scale=1.0 / s), out_shape=(patch_size, patch_size)
            ))
            for s in scales
        ]
        return jax.lax.switch(i, branches, img)

    lr = jax.vmap(degrade_one)(hr, idx)
    return lr, hr


def eval_pair(
    hr_image: jnp.ndarray, scale: int, y_only: bool, lr_space: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Protocol eval pair from one HWC HR image: crop to scale grid, degrade.

    Mirrors SURVEY §3.2: HR is cropped (not resized) so H, W are multiples of
    ``scale``, then bicubic-downsampled; SRCNN-style models get the bicubic
    re-upscaled input.
    """
    h, w, _ = hr_image.shape
    hr = hr_image[: h - h % scale, : w - w % scale, :]
    if hr.dtype == jnp.uint8:
        hr = hr.astype(jnp.float32) / 255.0
    if y_only:
        hr = rgb_to_y(hr)
    lr = degrade(hr, scale)
    if not lr_space:
        lr = imresize(lr, scale=float(scale))
    return lr, hr


def split_ycbcr_for_inference(rgb: jnp.ndarray):
    """Full-frame path helper: Y for the network, CbCr for bicubic upscale.

    SURVEY §3.3: classic SR upscales only luma with the network and chroma
    with plain bicubic, then re-merges.
    """
    ycbcr = rgb_to_ycbcr(rgb)
    return ycbcr[..., :1], ycbcr[..., 1:]
