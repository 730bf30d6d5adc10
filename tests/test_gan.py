"""SRGAN adversarial trainer tests (SURVEY §3.4 call-stack parity)."""

import numpy as np
import pytest

import jax

from ml_super_resolution_tpu.data.datasets import SyntheticImages
from ml_super_resolution_tpu.data.loader import TileLoader
from ml_super_resolution_tpu.train.gan import GANTrainer
from ml_super_resolution_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


@pytest.fixture(scope="module")
def cfg():
    return ExperimentConfig(
        model=ModelConfig(
            name="srgan", scale=4, channels=3, overrides={"num_blocks": 1}
        ),
        data=DataConfig(tile_size=64, patch_size=32, batch_size=4),
        train=TrainConfig(
            steps=2, learning_rate=1e-4, log_every=10**9, ckpt_every=10**9,
            dp=1,  # batch of 4 on the 8-virtual-device CI host
        ),
    )


def _tiles(n=4, size=64, seed=0):
    ds = SyntheticImages(n=n, size=size, seed=seed)
    return np.stack([ds.decode(i) for i in range(n)])


@pytest.mark.slow
def test_gan_step_updates_both_networks(cfg):
    tr = GANTrainer(cfg)
    state = tr.init_state(0)
    g0 = jax.tree.leaves(state.g_params)[0].copy()
    d0 = jax.tree.leaves(state.d_params)[0].copy()
    state, m = tr.train_step(state, _tiles())
    jax.block_until_ready(m)
    for k in ("d_loss", "g_loss", "pixel", "perceptual", "adversarial"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(np.asarray(jax.tree.leaves(state.g_params)[0]), np.asarray(g0))
    assert not np.allclose(np.asarray(jax.tree.leaves(state.d_params)[0]), np.asarray(d0))
    assert int(state.step) == 1


@pytest.mark.slow
def test_gan_two_steps_stable(cfg):
    tr = GANTrainer(cfg)
    state = tr.init_state(0)
    tiles = _tiles()
    for _ in range(2):
        state, m = tr.train_step(state, tiles)
        jax.block_until_ready(m)
    assert np.isfinite(float(m["g_loss"]))


@pytest.mark.slow
def test_gan_fit_with_pretrain(cfg, tmp_path):
    import dataclasses

    c = cfg.replace(
        train=dataclasses.replace(cfg.train, steps=2, pretrain_steps=2, log_every=1)
    )
    ds = SyntheticImages(n=4, size=64, seed=1)
    with TileLoader(ds, batch_size=4, tile_size=64, num_workers=1) as loader:
        tr = GANTrainer(c, workdir=tmp_path / "gan")
        state = tr.fit(loader)
        assert int(state.step) == 2
        tr.ckpt.close()
    assert (tmp_path / "gan" / "ckpts" / "config.json").exists()


def test_discriminator_accuracy_metrics_bounded(cfg):
    tr = GANTrainer(cfg)
    state = tr.init_state(0)
    state, m = tr.train_step(state, _tiles())
    assert 0.0 <= float(m["d_real_acc"]) <= 1.0
    assert 0.0 <= float(m["d_fake_acc"]) <= 1.0


def test_gan_evaluate(cfg):
    tr = GANTrainer(cfg)
    state = tr.init_state(0)
    imgs = [SyntheticImages(n=2, size=96, seed=11).decode(i) for i in range(2)]
    out = tr.evaluate(state, imgs)
    assert set(out) == {"psnr", "ssim"}
    assert np.isfinite(out["psnr"])


@pytest.mark.slow
def test_gan_resume_skips_pretrain(cfg, tmp_path, monkeypatch):
    """A restorable adversarial ckpt must short-circuit the MSE phase."""
    import dataclasses

    c = cfg.replace(
        train=dataclasses.replace(
            cfg.train, steps=2, pretrain_steps=1, ckpt_every=2, log_every=1
        )
    )
    ds = SyntheticImages(n=4, size=64, seed=1)
    with TileLoader(ds, batch_size=4, tile_size=64, num_workers=1) as loader:
        tr = GANTrainer(c, workdir=tmp_path / "gan")
        tr.fit(loader)
        tr.ckpt.close()
        # pretrain phase checkpointed under its own subdir (preemption-safe)
        assert (tmp_path / "gan" / "pretrain" / "ckpts").exists()

        tr2 = GANTrainer(c, workdir=tmp_path / "gan")
        called = []
        monkeypatch.setattr(
            tr2, "pretrain",
            lambda *a, **k: called.append(1) or (_ for _ in ()).throw(
                AssertionError("pretrain ran despite resumable checkpoint")
            ),
        )
        state = tr2.fit(loader)  # restores step 2, trains 0 new steps
        tr2.ckpt.close()
        assert int(state.step) == 2
        assert not called


def test_gan_featurenet_backbone(cfg, tmp_path):
    """Self-trained FeatureNet replaces VGG in the perceptual term."""
    from ml_super_resolution_tpu.models.featurenet import (
        FeatureNetAE,
        load_feature_net,
        save_feature_net,
    )
    import jax.numpy as jnp

    ae = FeatureNetAE()
    params = ae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    path = save_feature_net({"encoder": params["encoder"]}, tmp_path / "fn")
    assert path.exists()

    tr = GANTrainer(cfg, feature_net=path)
    state = tr.init_state(0)
    assert tr.vgg_params is None  # VGG never initialized
    state, m = tr.train_step(state, _tiles())
    assert np.isfinite(float(m["perceptual"]))
    # round-trip exactness of the npz save/load
    loaded = load_feature_net(path)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gan_steps_per_call_scan_matches_single(cfg):
    """One scan call of K=2 reproduces two sequential steps (same state).

    Verifies the multi-step wiring: per-step RNG fold_in chain, batch
    slicing order, state threading.  Compared via the step-2 METRICS:
    param-level equality is untestable for GANs because Adam's early
    updates are sign-like (update ~ lr * g/|g|), so leaves with near-zero
    gradients amplify ~1e-7 fusion-reassociation noise into full +-lr
    differences.  The metrics are sums over thousands of elements — robust
    to that noise, yet O(1)-wrong if the wiring were broken.
    """
    from ml_super_resolution_tpu.train.trainer import put_batch

    tr = GANTrainer(cfg)
    t0, t1 = _tiles(seed=3), _tiles(seed=4)

    sa = tr.init_state(0)
    sa, _ = tr.train_step(sa, t0)
    sa, ma = tr.train_step(sa, t1)
    jax.block_until_ready(ma)

    sb = tr.init_state(0)
    stack = put_batch(tr.stack_sharding, np.stack([t0, t1]))
    sb, mb = tr._gan_step_scan(sb, stack)
    jax.block_until_ready(mb)

    assert int(sa.step) == int(sb.step) == 2
    for k_ in ("d_loss", "g_loss", "pixel", "perceptual", "adversarial"):
        np.testing.assert_allclose(
            float(mb[k_]), float(ma[k_]), rtol=2e-2, atol=1e-4, err_msg=k_
        )


@pytest.mark.slow
def test_gan_fit_steps_per_call_smoke(tmp_path):
    """fit() with steps_per_call>1: schedule, cadences and tail all work."""
    import dataclasses
    import json

    c = ExperimentConfig(
        model=ModelConfig(
            name="srgan", scale=4, channels=3, overrides={"num_blocks": 1}
        ),
        data=DataConfig(tile_size=64, patch_size=32, batch_size=4),
        train=TrainConfig(
            steps=6, steps_per_call=4, learning_rate=1e-4, log_every=2,
            eval_every=10**9, ckpt_every=10**9, pretrain_steps=0,
            resume=False, dp=1,
        ),
    )
    ds = SyntheticImages(n=4, size=64, seed=3)
    with TileLoader(ds, batch_size=4, tile_size=64, deterministic=True,
                    seed=9) as loader:
        tr = GANTrainer(c, workdir=tmp_path / "k4")
        state = tr.fit(loader, steps=6)
    assert int(state.step) == 6
    lines = [json.loads(l) for l in
             (tmp_path / "k4" / "metrics.jsonl").read_text().splitlines()]
    gan_steps = [l["step"] for l in lines if l["kind"] == "gan"]
    assert gan_steps[-2:] == [4, 6]  # crossing semantics: 4 (scan), 6 (tail)


@pytest.mark.slow
def test_gan_device_dataset_mode(tmp_path):
    """GAN device-resident corpus: trains to the step target, no host batches."""
    import dataclasses
    import json

    c = ExperimentConfig(
        model=ModelConfig(
            name="srgan", scale=4, channels=3, overrides={"num_blocks": 1}
        ),
        data=DataConfig(tile_size=64, patch_size=32, batch_size=4,
                        device_dataset=True),
        train=TrainConfig(
            steps=3, steps_per_call=2, learning_rate=1e-4, log_every=1,
            eval_every=10**9, ckpt_every=10**9, pretrain_steps=0,
            resume=False, dp=1,
        ),
    )
    ds = SyntheticImages(n=4, size=80, seed=5)
    with TileLoader(ds, batch_size=4, tile_size=64) as loader:
        tr = GANTrainer(c, workdir=tmp_path / "dd")
        state = tr.fit(loader, steps=3)
    assert int(state.step) == 3
    lines = [json.loads(l) for l in
             (tmp_path / "dd" / "metrics.jsonl").read_text().splitlines()]
    assert any(l["kind"] == "device_data" for l in lines)
    gl = [l["g_loss"] for l in lines if l["kind"] == "gan"]
    assert gl and all(np.isfinite(v) for v in gl)


@pytest.mark.slow
def test_gan_d_balance_knobs(cfg):
    """D-balance controls (VERDICT r2 weak #5): label smoothing moves the
    optimal-D loss floor off zero, R1 adds a real-gradient penalty, and
    d_lr_scale shrinks the D update — all three must change the step
    measurably and stay finite."""
    import dataclasses

    base = GANTrainer(cfg)
    bal = GANTrainer(dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, d_lr_scale=0.1, label_smooth=0.1, r1_gamma=10.0)))
    tiles = _tiles()
    s0 = base.init_state(0)
    s1 = bal.init_state(0)
    s0, m0 = base.train_step(s0, tiles)
    s1, m1 = bal.train_step(s1, tiles)
    jax.block_until_ready((m0, m1))
    for k in ("d_loss", "g_loss", "adversarial"):
        assert np.isfinite(float(m0[k])) and np.isfinite(float(m1[k])), k
    # same init, same batch: the balanced D loss includes smoothing + R1
    assert float(m1["d_loss"]) != pytest.approx(float(m0["d_loss"]), rel=1e-3)
    # d_lr_scale=0.1: the balanced D moved less from init than the base D
    d_init = np.asarray(jax.tree.leaves(base.init_state(0).d_params)[0])
    step0 = np.abs(np.asarray(jax.tree.leaves(s0.d_params)[0]) - d_init).max()
    step1 = np.abs(np.asarray(jax.tree.leaves(s1.d_params)[0]) - d_init).max()
    assert step1 < step0


@pytest.mark.slow
def test_gan_patchwise_d_and_augment(cfg):
    """D-task hardening (VERDICT r3 weak #5): patch-wise D crops every D
    input to d_patch^2 (D's dense head is built at that size) and
    d_augment's flips/rot90 are differentiable — the adversarial gradient
    must still reach G through the view."""
    import dataclasses

    import jax.numpy as jnp

    c = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, d_patch=16, d_augment=True)
    )
    tr = GANTrainer(c)
    state = tr.init_state(0)
    # D initialized at the viewed size: first dense kernel differs from the
    # full-patch build
    full = GANTrainer(cfg).init_state(0)
    d_shapes = [p.shape for p in jax.tree.leaves(state.d_params)]
    f_shapes = [p.shape for p in jax.tree.leaves(full.d_params)]
    assert d_shapes != f_shapes

    # the view: correct shape, differentiable, non-degenerate
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3)),
                    jnp.float32)
    key = jax.random.key(7)
    v = tr._d_view(key, x)
    assert v.shape == (4, 16, 16, 3)
    g = jax.grad(lambda z: jnp.sum(tr._d_view(key, z) ** 2))(x)
    assert float(jnp.abs(g).max()) > 0.0

    # a full adversarial step runs with finite metrics
    state, m = tr.train_step(state, _tiles())
    jax.block_until_ready(m)
    for k in ("d_loss", "g_loss", "adversarial", "d_real_acc", "d_fake_acc"):
        assert np.isfinite(float(m[k])), k


def test_gan_d_view_off_is_identity(cfg):
    """With d_patch=0 and d_augment off, _d_view is the identity — the
    round-3 training recipe is bit-unchanged by the round-4 knobs."""
    import jax.numpy as jnp

    tr = GANTrainer(cfg)
    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3)),
                    jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(tr._d_view(jax.random.key(0), x)), np.asarray(x)
    )
