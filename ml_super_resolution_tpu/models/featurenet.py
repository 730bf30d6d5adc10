"""Self-trained feature network: offline perceptual-loss backbone.

The SRGAN paper's perceptual loss (arXiv:1609.04802 §2.2.1) needs an
ImageNet-pretrained VGG19; this zero-egress image has no pretrained
weights, and a random-init VGG is only a random projection.  The honest
offline substitute (VERDICT round 1, item 5) is a small feature encoder
*trained here* on the same image distribution the GAN trains on, with a
denoising-autoencoder objective: corrupt the input, reconstruct it, keep
the encoder.  Reconstruction forces the encoder to represent edges and
texture — exactly the statistics a perceptual loss should compare — while
being label-free.

Usage:
    sr featurenet --workdir runs/featnet [--steps N --data DIR]
    sr train --model srgan --feature-net runs/featnet ...

TPU notes: all-conv NHWC, stride-2 downsampling (no pooling → better MXU
utilization), trained with the same jitted-donated-step pattern as the
main Trainer.  Feature comparisons in the GAN loss run in f32 (stability,
SURVEY §7).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "FeatureNet",
    "FeatureNetAE",
    "fit_feature_net",
    "save_feature_net",
    "load_feature_net",
]


class FeatureNet(nn.Module):
    """Conv encoder; returns pre-activation features of the last layer.

    Mirrors the role of VGG54 (deep, spatially-downsampled feature map):
    5 convs, two stride-2 stages -> features at 1/4 resolution with a
    ~30px receptive field.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        spec = [(64, 1), (64, 2), (128, 1), (128, 2), (256, 1)]
        for i, (feats, stride) in enumerate(spec):
            x = nn.Conv(
                feats, (3, 3), strides=(stride, stride), padding="SAME",
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            if i < len(spec) - 1:
                x = nn.relu(x)
        return x.astype(jnp.float32)  # pre-activation, f32 for the loss


class FeatureNetAE(nn.Module):
    """Encoder + light decoder for denoising-AE training (training only)."""

    @nn.compact
    def __call__(self, x):
        feats = nn.relu(FeatureNet(name="encoder")(x))
        # decoder: two sub-pixel x2 stages back to input resolution
        y = nn.Conv(128, (3, 3), padding="SAME", name="dec1")(feats)
        y = nn.relu(y)
        y = nn.Conv(64 * 4, (3, 3), padding="SAME", name="dec2")(y)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, 64).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(n, h * 2, w * 2, 64)
        y = nn.relu(y)
        y = nn.Conv(3 * 4, (3, 3), padding="SAME", name="dec3")(y)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, h * 2, w * 2, 3)


def fit_feature_net(
    loader, steps: int = 3000, lr: float = 2e-4, seed: int = 0,
    patch: int = 96, log=print,
):
    """Train the denoising AE on uint8 HR tile batches; return encoder params.

    ``loader`` yields (N, T, T, 3) uint8 tiles (the TileLoader contract).
    One jitted donated step: crop, normalize, corrupt with Gaussian noise,
    reconstruct, MSE.
    """
    import optax

    from ml_super_resolution_tpu.ops.patches import random_hr_patches

    model = FeatureNetAE()
    tx = optax.adam(lr)
    k0 = jax.random.key(seed)
    params = model.init(k0, jnp.zeros((1, patch, patch, 3), jnp.float32))["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng, tiles):
        kc, kn, rng = jax.random.split(rng, 3)
        x = random_hr_patches(kc, tiles, patch, 1).astype(jnp.float32) / 255.0
        noisy = x + 0.05 * jax.random.normal(kn, x.shape, jnp.float32)

        def loss_fn(p):
            recon = model.apply({"params": p}, noisy)
            return jnp.mean(jnp.square(recon - x))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    rng = jax.random.key(seed + 1)
    it = iter(loader)
    for i in range(steps):
        params, opt_state, rng, loss = step(params, opt_state, rng, next(it))
        if (i + 1) % 200 == 0 or i == 0:
            log(f"featurenet step {i + 1}/{steps} loss {float(loss):.5f}")
    return {"encoder": params["encoder"]}


def save_feature_net(params, workdir: str | Path) -> Path:
    """Flatten the encoder params to an npz next to a marker name."""
    import flax

    wd = Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    flat = flax.traverse_util.flatten_dict(params["encoder"])
    arrays = {"/".join(k): np.asarray(v) for k, v in flat.items()}
    out = wd / "featurenet.npz"
    np.savez(out, **arrays)
    return out


def feature_distance(params, a, b):
    """Mean squared FeatureNet-feature distance — the perceptual *metric*
    counterpart of the GAN's perceptual *loss* (lower = perceptually closer).

    ``a``/``b``: (H, W, C) or (N, H, W, C) images in [0, 1].  Grayscale
    (C=1) inputs are replicated to the encoder's 3 channels — a defined
    (if off-distribution) metric for the Y-only models; RGB models are the
    intended consumers (SRGAN/SRResNet eval).
    """
    net = FeatureNet()
    if a.ndim == 3:
        a, b = a[None], b[None]
    if a.shape[-1] == 1:
        a = jnp.repeat(a, 3, axis=-1)
        b = jnp.repeat(b, 3, axis=-1)
    fa = net.apply({"params": params}, a)
    fb = net.apply({"params": params}, b)
    return jnp.mean((fa - fb) ** 2)


def load_feature_net(path: str | Path):
    """Inverse of save_feature_net -> FeatureNet params pytree."""
    import flax

    p = Path(path)
    if p.is_dir():
        p = p / "featurenet.npz"
    src = np.load(p)
    flat = {tuple(k.split("/")): jnp.asarray(src[k]) for k in src.files}
    return flax.traverse_util.unflatten_dict(flat)
