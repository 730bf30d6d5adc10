"""Training/eval engine (L4 of SURVEY §1b)."""

from ml_super_resolution_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from ml_super_resolution_tpu.train.checkpoint import CheckpointManager  # noqa: F401
