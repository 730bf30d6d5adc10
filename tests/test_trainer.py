"""Trainer engine tests: overfit smoke, checkpoint resume, DP equivalence
(SURVEY §4 "Model" + "Integration" rows)."""

import numpy as np
import pytest

import jax

from ml_super_resolution_tpu.data.datasets import SyntheticImages
from ml_super_resolution_tpu.data.loader import TileLoader
from ml_super_resolution_tpu.train.trainer import Trainer
from ml_super_resolution_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


def _cfg(name="srcnn", scale=2, **train_kw):
    channels = 3 if name in ("srresnet", "srgan") else 1
    overrides = {"num_blocks": 1} if name in ("srresnet", "srgan") else {}
    return ExperimentConfig(
        model=ModelConfig(name=name, scale=scale, channels=channels, overrides=overrides),
        data=DataConfig(tile_size=64, patch_size=32, batch_size=8),
        train=TrainConfig(
            **{
                "steps": 10, "learning_rate": 1e-3, "log_every": 1000,
                "eval_every": 10**9, "ckpt_every": 10**9, **train_kw,
            }
        ),
    )


def _tiles(n=8, size=64, seed=0):
    ds = SyntheticImages(n=n, size=size, seed=seed)
    return np.stack([ds.decode(i) for i in range(n)])


def test_overfit_one_batch_srcnn():
    """Loss on a fixed batch decreases by >3x over 60 steps (CPU-runnable,
    per BASELINE.json:7)."""
    tr = Trainer(_cfg("srcnn"))
    state = tr.init_state(0)
    tiles = _tiles()
    first = None
    for _ in range(60):
        state, m = tr.train_step(state, tiles)
        # sync per step: on the 1-core/8-virtual-device CI host, queueing many
        # async collective programs starves XLA:CPU's rendezvous and aborts
        jax.block_until_ready(m)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first / 3, (first, last)


@pytest.mark.parametrize("name", ["espcn", "vdsr", "srresnet"])
def test_one_step_all_models(name):
    tr = Trainer(_cfg(name, scale=2))
    state = tr.init_state(0)
    state, m = tr.train_step(state, _tiles())
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_vdsr_grad_clipping_applies():
    tr = Trainer(_cfg("vdsr", grad_clip_norm=1e-6, learning_rate=0.0))
    state = tr.init_state(0)
    # lr=0 → params unchanged; just verifies the optax chain builds/runs
    state, m = tr.train_step(state, _tiles())
    assert np.isfinite(float(m["grad_norm"]))


def test_evaluate_protocol():
    tr = Trainer(_cfg("srcnn"))
    state = tr.init_state(0)
    imgs = [SyntheticImages(n=2, size=96, seed=9).decode(i) for i in range(2)]
    out = tr.evaluate(state, imgs)
    assert set(out) == {"psnr", "ssim"}
    assert 5 < out["psnr"] < 60


def test_fit_and_resume(tmp_path):
    ds = SyntheticImages(n=8, size=64, seed=1)
    cfg = _cfg("espcn").replace(
        train=TrainConfig(
            steps=4, log_every=2, eval_every=10**9, ckpt_every=2, resume=True
        )
    )
    with TileLoader(ds, batch_size=8, tile_size=64, num_workers=1) as loader:
        tr = Trainer(cfg, workdir=tmp_path / "run")
        state = tr.fit(loader, steps=4)
        assert int(state.step) == 4

        # new trainer instance resumes from step 4 and trains to 6
        tr2 = Trainer(cfg, workdir=tmp_path / "run")
        state2 = tr2.fit(loader, steps=6)
        assert int(state2.step) == 6
        tr2.ckpt.close()
        tr.ckpt.close()


def test_dp_sharded_step_matches_single_device():
    """SURVEY §4: sharded step ≡ single-device step on the 8 fake devices."""
    tiles = _tiles(n=8)
    cfg1 = _cfg("srcnn").replace(train=_cfg("srcnn").train.__class__(dp=1, steps=1))
    cfg8 = _cfg("srcnn").replace(train=_cfg("srcnn").train.__class__(dp=8, steps=1))
    tr1, tr8 = Trainer(cfg1), Trainer(cfg8)
    s1, s8 = tr1.init_state(0), tr8.init_state(0)
    for _ in range(3):
        s1, m1 = tr1.train_step(s1, tiles)
        s8, m8 = tr8.train_step(s8, tiles)
        jax.block_until_ready((m1, m8))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_trunk_runs():
    tr = Trainer(_cfg("espcn", bf16=True))
    state = tr.init_state(0)
    state, m = tr.train_step(state, _tiles())
    assert np.isfinite(float(m["loss"]))
    # params stay f32
    assert all(p.dtype == np.float32 for p in jax.tree.leaves(state.params))


def test_vdsr_multiscale_training_step():
    import dataclasses

    cfg = _cfg("vdsr")
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, scales=(2, 3, 4)))
    tr = Trainer(cfg)
    state = tr.init_state(0)
    state, m = tr.train_step(state, _tiles())
    assert np.isfinite(float(m["loss"]))


def test_steps_per_call_scan_matches_single_steps(tmp_path):
    """Multi-step dispatch (lax.scan over K stacked batches) reproduces the
    K=1 trajectory exactly: same deterministic batch stream, same per-step
    RNG fold_in chain, same final params and logged metrics cadence."""
    ds = SyntheticImages(n=8, size=64, seed=2)

    def run(k, wd):
        cfg = _cfg("espcn").replace(
            train=TrainConfig(
                steps=9, log_every=3, eval_every=10**9, ckpt_every=10**9,
                steps_per_call=k, resume=False,
            )
        )
        with TileLoader(ds, batch_size=8, tile_size=64, deterministic=True,
                        seed=5) as loader:
            tr = Trainer(cfg, workdir=wd)
            return tr.fit(loader, steps=9)

    s1 = run(1, tmp_path / "k1")
    s4 = run(4, tmp_path / "k4")  # 2 scans of 4 + 1 single-step tail
    assert int(s1.step) == int(s4.step) == 9
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # cadence: both runs logged train lines at steps 3, 6, 9
    import json

    def logged(wd):
        lines = (wd / "metrics.jsonl").read_text().splitlines()
        return [json.loads(l)["step"] for l in lines
                if json.loads(l)["kind"] == "train"]

    assert logged(tmp_path / "k1")[-3:] == [3, 6, 9]
    # K=4: boundaries fire on crossing — after the call that passes them
    assert logged(tmp_path / "k4")[-3:] == [4, 8, 9]


@pytest.mark.slow
def test_device_dataset_mode(tmp_path):
    """Device-resident corpus: trains, bit-deterministic, scan == singles."""
    import dataclasses
    import json

    ds = SyntheticImages(n=6, size=80, seed=4)

    def run(wd, k):
        cfg = _cfg("srcnn").replace(
            data=DataConfig(tile_size=64, patch_size=32, batch_size=8,
                            device_dataset=True),
            train=TrainConfig(
                steps=6, steps_per_call=k, log_every=2, eval_every=10**9,
                ckpt_every=10**9, resume=False,
            ),
        )
        with TileLoader(ds, batch_size=8, tile_size=64) as loader:
            tr = Trainer(cfg, workdir=wd)
            return tr.fit(loader, steps=6)

    sa = run(tmp_path / "a", 1)
    sb = run(tmp_path / "b", 1)   # identical seed => identical run
    sc = run(tmp_path / "c", 4)   # scan(4) + 2 singles, same trajectory
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # it actually trained
    lines = [json.loads(l) for l in
             (tmp_path / "a" / "metrics.jsonl").read_text().splitlines()]
    losses = [l["loss"] for l in lines if l["kind"] == "train"]
    assert losses[-1] < losses[0]


def test_restore_structure_mismatch_names_the_cause(tmp_path):
    """Resuming with flags that change the opt_state pytree must fail with
    an actionable message (naming config drift + config.json), not orbax's
    raw metadata diff (observed 2026-08-19: a chip queue spun 15 min on the
    bare error after adding --lr-decay-steps to a constant-lr run)."""
    import jax.numpy as jnp

    from ml_super_resolution_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpts", max_to_keep=1)
    saved = {"params": {"w": jnp.ones((2,))}, "opt_state": {"mu": jnp.zeros((2,))}}
    mgr.save(7, saved)
    mgr.wait()
    template = {"params": {"w": jnp.ones((2,))},
                "opt_state": {"mu": jnp.zeros((2,)), "count": jnp.zeros(())}}
    with pytest.raises(ValueError, match="config.json"):
        CheckpointManager(tmp_path / "ckpts", max_to_keep=1).restore_latest(template)
