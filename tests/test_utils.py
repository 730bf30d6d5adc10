"""Config round-trip, metrics logging, profiling helper coverage."""

import json

import jax.numpy as jnp
import numpy as np

from ml_super_resolution_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from ml_super_resolution_tpu.utils.logging import MetricsLogger
from ml_super_resolution_tpu.utils.profiling import device_timer


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(name="vdsr", scale=3, channels=1, overrides={"depth": 10}),
        data=DataConfig(batch_size=16, scales=(2, 3, 4)),
        train=TrainConfig(steps=42, bf16=True),
    )
    p = tmp_path / "config.json"
    cfg.save(p)
    back = ExperimentConfig.load(p)
    assert back.model.name == "vdsr"
    assert back.model.overrides == {"depth": 10}
    assert tuple(back.data.scales) == (2, 3, 4)
    assert back.train.steps == 42 and back.train.bf16


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(tmp_path, echo=False)
    log.log("train", 1, loss=0.5, lr=1e-3)
    log.log("eval", 2, psnr=30.1)
    log.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["kind"] == "train" and lines[0]["loss"] == 0.5
    assert lines[1]["kind"] == "eval" and lines[1]["step"] == 2


def test_device_timer_positive():
    x = jnp.ones((256, 256))

    def f(a):
        return a @ a

    dt = device_timer(f, x, iters=3)
    assert np.isfinite(dt)
