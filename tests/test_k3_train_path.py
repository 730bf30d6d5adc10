"""K3 wiring: --pallas-preprocess swaps the in-step data stage, same math."""

import dataclasses

import jax
import numpy as np

from ml_super_resolution_tpu.train.trainer import Trainer
from ml_super_resolution_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


def _cfg(pallas_preprocess: bool, name="espcn", scale=2):
    return ExperimentConfig(
        model=ModelConfig(name=name, scale=scale, channels=1),
        data=DataConfig(patch_size=24, batch_size=4, tile_size=48),
        train=TrainConfig(steps=2, learning_rate=1e-4, dp=1,
                          pallas_preprocess=pallas_preprocess),
    )


def _one_step(cfg, tiles):
    tr = Trainer(cfg, workdir=None)
    state = tr.init_state(0)
    state, metrics = tr.train_step(state, tiles)
    return float(metrics["loss"]), state


def test_k3_step_matches_xla_path():
    tiles = (np.random.default_rng(0).random((4, 48, 48, 3)) * 255).astype(
        np.uint8
    )
    loss_xla, st_a = _one_step(_cfg(False), tiles)
    loss_k3, st_b = _one_step(_cfg(True), tiles)
    # same crops (same key), same luma/degrade math -> same loss
    assert abs(loss_xla - loss_k3) < 1e-6
    pa = jax.tree.leaves(st_a.params)
    pb = jax.tree.leaves(st_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_k3_pre_upscale_model_path():
    """srcnn (lr_space=False): K3 output is re-upscaled to HR size."""
    tiles = (np.random.default_rng(1).random((4, 48, 48, 3)) * 255).astype(
        np.uint8
    )
    loss_xla, _ = _one_step(_cfg(False, name="srcnn"), tiles)
    loss_k3, _ = _one_step(_cfg(True, name="srcnn"), tiles)
    assert abs(loss_xla - loss_k3) < 1e-6
