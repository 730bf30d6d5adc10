"""Frozen dataclass configuration (replaces the reference's ``tf.app.flags``).

The reference configured each per-paper script with ``tf.app.flags.DEFINE_*``
globals (SURVEY §5.6).  The rebuild uses typed frozen dataclasses with a
single registry keyed by model name; configs serialize to JSON into the
checkpoint directory for reproducibility and round-trip back for resume.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

__all__ = ["ModelConfig", "DataConfig", "TrainConfig", "ExperimentConfig"]


@dataclass(frozen=True)
class ModelConfig:
    """Which network to build and at what scale."""

    name: str = "srcnn"  # srcnn | espcn | vdsr | srresnet | srgan
    scale: int = 2
    # Channel count the network sees: 1 (Y-channel protocol) or 3 (RGB).
    channels: int = 1
    # Model-specific hyperparameters (depth, filters, ...); defaults per paper.
    overrides: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class DataConfig:
    """Host decode + on-device pipeline parameters."""

    train_dir: str = ""
    eval_dir: str = ""
    # Fixed-size HR tiles the host hands to the device (decode-once/crop-many).
    tile_size: int = 256
    patch_size: int = 96
    batch_size: int = 64
    augment: bool = True
    # Multi-scale joint training (VDSR protocol): non-empty => each example
    # draws a scale from this set; pre-upscale models only.
    scales: tuple = ()
    # Patches-per-tile fanout on device; host decode amortized by this factor.
    patches_per_tile: int = 4
    prefetch: int = 2
    num_workers: int = 4
    seed: int = 0
    # Deterministic host pipeline (SURVEY §5.2): single producer thread with
    # a seeded permutation stream — identical runs produce identical batch
    # sequences (and therefore identical metrics), at reduced ingest rate.
    deterministic: bool = False
    # Device-resident dataset: stage ALL decoded images on the device once
    # and sample training tiles with the device PRNG inside the jitted step
    # — ZERO steady-state host->device traffic.  SR datasets are tiny (T91
    # ~18 MB decoded), so this is the natural TPU-native pipeline whenever
    # the corpus fits in HBM; it also makes runs bit-deterministic for free.
    # Images are reflect-padded to the corpus max HxW at staging.
    device_dataset: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / checkpoint / parallelism knobs."""

    steps: int = 100_000
    learning_rate: float = 1e-3
    # VDSR protocol: high LR + gradient clipping (arXiv:1511.04587 §3.3).
    grad_clip_norm: float = 0.0  # 0 disables
    lr_decay_steps: int = 0  # 0 disables staircase decay
    lr_decay_rate: float = 0.1
    weight_decay: float = 0.0
    ema_decay: float = 0.0  # 0 disables params EMA
    # Pixel loss: "mse" (SRCNN/ESPCN/VDSR/SRResNet protocol) or "l1"
    # (EDSR protocol, arXiv:1707.02921 §4.2).
    loss: str = "mse"
    # bf16 compute for conv stacks; params/optimizer state stay f32.
    bf16: bool = False
    # K3: route the in-step RGB->Y + bicubic-degrade stage through the fused
    # Pallas kernel (kernels/preprocess.py) instead of the XLA-fused ops
    # path.  Y-channel single-scale models only; measured delta in RESULTS.md.
    pallas_preprocess: bool = False
    qat: bool = False
    # Multi-step dispatch: lax.scan over K stacked batches per jitted call.
    # Amortizes host->device round trips K-fold (decisive on high-latency
    # attach paths; also cuts dispatch overhead on healthy hosts).  Batch
    # order, RNG streams and math are identical to K=1 (test_trainer).
    # log/eval/ckpt cadences fire on crossing their boundaries.
    steps_per_call: int = 1
    eval_every: int = 1000
    log_every: int = 100
    ckpt_every: int = 1000
    ckpt_dir: str = "ckpts"
    max_to_keep: int = 3
    resume: bool = True
    # Data-parallel submesh size; 0 = all visible devices.
    dp: int = 0
    # SRGAN two-phase schedule (arXiv:1609.04802): MSE pretrain steps before
    # the adversarial phase; ignored by non-GAN trainers.
    pretrain_steps: int = 0
    adversarial_weight: float = 1e-3
    perceptual_weight: float = 1.0 / 12.75**2
    # D/G balance controls (round-3: the unregularized D saturated to
    # accuracy 1.0/1.0 within 600 steps, collapsing the adversarial signal).
    # d_lr_scale < 1 slows D; label_smooth > 0 is one-sided smoothing of the
    # D's real target (1 -> 1-label_smooth); r1_gamma > 0 adds the R1
    # gradient penalty gamma/2*E||dD/dx(real)||^2 (Mescheder et al. 2018).
    d_lr_scale: float = 1.0
    label_smooth: float = 0.0
    r1_gamma: float = 0.0
    # D-task hardening (round 4): capacity/LR rebalancing alone left D's
    # accuracy pinned at 1.0/1.0 — a D that is never wrong is a weak
    # adversary, so make the TASK harder instead.  d_patch > 0 shows D only
    # a random d_patch^2 sub-patch of each input (patch-wise D: no global
    # layout cues, decisions from local texture); d_augment applies
    # differentiable per-sample flips/rot90 to every D input (reals and
    # fakes alike, DiffAugment-style — gradients still flow to G).
    d_patch: int = 0
    d_augment: bool = False
    # Image summaries at each eval (the reference's tf.summary image leg,
    # SURVEY §5.5): bicubic/SR/HR PNG triplet of the first eval image under
    # <workdir>/previews (+ TB mirror when enabled).  Off by default: each
    # preview is a full-image readback, which is costly on attach relays.
    previews: bool = False
    debug_nans: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            data=DataConfig(**raw.get("data", {})),
            train=TrainConfig(**raw.get("train", {})),
        )

    @classmethod
    def load(cls, path: str | Path) -> "ExperimentConfig":
        return cls.from_json(Path(path).read_text())

    def replace(self, **kwargs) -> "ExperimentConfig":
        return dataclasses.replace(self, **kwargs)
