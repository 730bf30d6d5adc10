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


def test_metrics_logger_image_previews(tmp_path):
    # image summaries (SURVEY §5.5): PNGs under <dir>/previews, round-trip
    import numpy as np
    from PIL import Image

    log = MetricsLogger(tmp_path, echo=False)
    rgb = (np.arange(12 * 10 * 3) % 256).astype(np.uint8).reshape(12, 10, 3)
    gray = rgb[..., :1]
    log.log_images("eval", 7, sr=rgb, hr=gray)
    log.close()
    back = np.asarray(Image.open(tmp_path / "previews" / "00000007_eval_sr.png"))
    np.testing.assert_array_equal(back, rgb)
    gback = np.asarray(Image.open(tmp_path / "previews" / "00000007_eval_hr.png"))
    np.testing.assert_array_equal(gback, gray[..., 0])
    # a dir-less logger must no-op, not crash
    MetricsLogger(None, echo=False).log_images("eval", 1, sr=rgb)


def test_trainer_eval_previews(tmp_path):
    import numpy as np

    from ml_super_resolution_tpu.train.trainer import Trainer
    from ml_super_resolution_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(name="espcn", scale=2, channels=1),
        data=DataConfig(patch_size=16, batch_size=4),
        train=TrainConfig(steps=1, log_every=10**9),
    )
    trainer = Trainer(cfg, workdir=None)
    state = trainer.init_state(0)
    img = (np.random.default_rng(0).random((24, 20, 3)) * 255).astype(np.uint8)
    trip = trainer.eval_previews(state, img)
    assert set(trip) == {"bicubic", "sr", "hr"}
    for v in trip.values():
        assert v.dtype == np.uint8 and v.shape[-1] == 1
    # bicubic/sr/hr all live in HR space (eval_pair shaves to scale multiple)
    assert trip["sr"].shape == trip["hr"].shape == trip["bicubic"].shape


def test_device_timer_positive():
    x = jnp.ones((256, 256))

    def f(a):
        return a @ a

    dt = device_timer(f, x, iters=3)
    assert np.isfinite(dt)
