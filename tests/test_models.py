"""Model zoo checks: shapes, paper param counts, gradient flow (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.models import (
    ESPCN,
    MODEL_SPECS,
    SRCNN,
    SRGANDiscriminator,
    SRResNet,
    VDSR,
    build_model,
)
from ml_super_resolution_tpu.models.vgg import VGG19Features, load_vgg19_params
from ml_super_resolution_tpu.utils.config import ModelConfig


def _n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_srcnn_shape_and_params():
    m = SRCNN(channels=1)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 33, 33, 1), jnp.float32))
    out = m.apply(vars_, jnp.zeros((2, 40, 44, 1), jnp.float32))
    assert out.shape == (2, 40, 44, 1)
    # 9-5-5 / 64-32: 81*64+64 + 64*25*32+32 + 32*25*1+1 = 5248+51232+801
    assert _n_params(vars_["params"]) == 57281


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_espcn_shape(scale):
    m = ESPCN(scale=scale, channels=1)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 17, 17, 1), jnp.float32))
    out = m.apply(vars_, jnp.zeros((2, 12, 14, 1), jnp.float32))
    assert out.shape == (2, 12 * scale, 14 * scale, 1)


def test_espcn_icnr_init_is_shuffle_uniform():
    """ICNR: at init the r^2 sub-pixel outputs are identical per LR pixel, so
    the upscaled output is blockwise-constant (checkerboard-free)."""
    m = ESPCN(scale=3, channels=1)
    x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 1))
    vars_ = m.init(jax.random.key(0), x)
    out = np.asarray(m.apply(vars_, x))
    blocks = out[0, :, :, 0].reshape(8, 3, 8, 3).transpose(0, 2, 1, 3)
    assert np.allclose(blocks, blocks[:, :, :1, :1], atol=1e-6)


def test_vdsr_params_and_residual():
    m = VDSR(channels=1)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 41, 41, 1), jnp.float32))
    # 20 layers, 64 wide: (3*3*1*64+64) + 18*(3*3*64*64+64) + (3*3*64*1+1)
    # = 640 + 18*36928 + 577 = 665921 (~665K, paper §3 "Very deep networks")
    assert _n_params(vars_["params"]) == 640 + 18 * 36928 + 577
    # zero-input residual: output == input + residual(input)
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 1))
    out = m.apply(vars_, x)
    assert out.shape == x.shape


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_srresnet_shapes(scale):
    m = SRResNet(scale=scale, channels=3, num_blocks=2)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
    out = m.apply(vars_, jnp.zeros((2, 10, 12, 3), jnp.float32), train=False)
    assert out.shape == (2, 10 * scale, 12 * scale, 3)
    assert "batch_stats" in vars_


def test_srresnet_full_param_count():
    """Paper ~1.5M params for B=16 (generator)."""
    m = SRResNet(scale=4, channels=3, num_blocks=16)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
    n = _n_params(vars_["params"])
    assert 1.4e6 < n < 1.8e6, n


def test_srresnet_train_mode_updates_batch_stats():
    m = SRResNet(scale=2, channels=3, num_blocks=1)
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3))
    vars_ = m.init(jax.random.key(1), x, train=False)
    out, mutated = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(vars_["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_discriminator_logit_shape():
    m = SRGANDiscriminator()
    x = jnp.zeros((4, 96, 96, 3), jnp.float32)
    vars_ = m.init(jax.random.key(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (4, 1)


def test_vgg_features_shape_and_loader_fallback():
    m = VGG19Features()
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    vars_ = m.init(jax.random.key(0), x)
    feats = m.apply(vars_, x)
    # conv5_4: 4 poolings before block5 -> 96/16 = 6
    assert feats.shape == (1, 6, 6, 512)
    params, pretrained = load_vgg19_params(None, vars_["params"])
    assert not pretrained


def test_vgg_npz_roundtrip(tmp_path):
    import flax

    m = VGG19Features(stop_block=2, stop_conv=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vars_ = m.init(jax.random.key(0), x)
    flat = flax.traverse_util.flatten_dict(vars_["params"])
    save = {
        f"{k[-2]}/{k[-1]}": np.asarray(v, dtype=np.float32) for k, v in flat.items()
    }
    np.savez(tmp_path / "vgg.npz", **save)
    params, pretrained = load_vgg19_params(tmp_path / "vgg.npz", vars_["params"])
    assert pretrained
    for k, v in flax.traverse_util.flatten_dict(params).items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat[k]))


@pytest.mark.parametrize("name", list(MODEL_SPECS))
def test_registry_builds_and_runs(name):
    cfg = ModelConfig(
        name=name,
        scale=2,
        channels=3 if name in ("srresnet", "srgan") else 1,
        overrides={"num_blocks": 2} if name in ("srresnet", "srgan") else {},
    )
    m = build_model(cfg)
    spec = MODEL_SPECS[name]
    c = cfg.channels
    x = jnp.zeros((1, 16, 16, c), jnp.float32)
    vars_ = m.init(jax.random.key(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    expect = 16 * (1 if not spec["lr_space"] else 2)
    assert out.shape == (1, expect, expect, c)
    assert spec["rf_radius"](2) > 0


def test_gradients_flow_everywhere():
    """No dead params at init (catches disconnected branches)."""
    m = ESPCN(scale=2, channels=1)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 1))
    y = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    vars_ = m.init(jax.random.key(2), x)

    def loss(p):
        return jnp.mean((m.apply({"params": p}, x) - y) ** 2)

    grads = jax.grad(loss)(vars_["params"])
    for g in jax.tree.leaves(grads):
        assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_edsr_shapes(scale):
    from ml_super_resolution_tpu.models import EDSR

    m = EDSR(scale=scale, channels=3, num_blocks=2)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3), jnp.float32))
    out = m.apply(vars_, jnp.zeros((2, 10, 12, 3), jnp.float32))
    assert out.shape == (2, 10 * scale, 12 * scale, 3)
    # no BN anywhere (paper §3.1): a single stateless collection
    assert set(vars_) == {"params"}


def test_edsr_baseline_param_count():
    """EDSR-baseline (16 blocks x 64): paper table 1 reports 1.37M at x2
    (arXiv:1707.02921); x4 adds one more upsample stage conv."""
    from ml_super_resolution_tpu.models import EDSR

    m = EDSR(scale=2, channels=3, num_blocks=16)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3), jnp.float32))
    n = _n_params(vars_["params"])
    assert 1.3e6 < n < 1.45e6, n


def test_edsr_residual_scaling_contracts_block_output():
    from ml_super_resolution_tpu.models import EDSR

    x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 3))
    outs = {}
    for rs in (1.0, 0.1):
        m = EDSR(scale=2, channels=3, num_blocks=2, res_scale=rs)
        vars_ = m.init(jax.random.key(0), x)
        outs[rs] = np.asarray(m.apply(vars_, x))
    # same init => scaled-residual trunk deviates less from its head path
    assert not np.allclose(outs[1.0], outs[0.1])


def test_edsr_registry_and_build():
    from ml_super_resolution_tpu.models import MODEL_SPECS

    spec = MODEL_SPECS["edsr"]
    assert spec["lr_space"] and not spec["y_only"]
    assert spec["rf_radius"](4) >= 35
    m = build_model(ModelConfig(name="edsr", scale=4, channels=3))
    assert m.scale == 4 and m.num_blocks == 16
