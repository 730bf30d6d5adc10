"""Orbax checkpointing: async save, atomic, resumable (SURVEY §5.3/§5.4).

The reference used ``tf.train.Saver`` periodic saves with manual restart;
here saves are preemption-safe (Orbax writes to a tmp dir and atomically
renames), ``--resume`` picks the latest step automatically, and the
experiment config is serialized next to the checkpoints so a run directory
is self-describing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

from ml_super_resolution_tpu.utils.config import ExperimentConfig


class CheckpointManager:
    def __init__(self, ckpt_dir: str | Path, max_to_keep: int = 3):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        """Restore into the structure of ``template``; None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except ValueError as e:
            # Orbax raises a structure-mismatch ValueError when the run is
            # resumed with flags that change the state pytree — most often a
            # different optimizer chain (e.g. adding --lr-decay-steps to a
            # run whose checkpoints were saved with constant lr changes
            # opt_state's shape).  Surface the actionable cause instead of
            # the raw metadata diff (observed 2026-08-19: a chip queue spun
            # for 15 min on the bare orbax error).
            raise ValueError(
                f"checkpoint at step {step} in {self.dir} does not match the "
                "current training state structure. This usually means the "
                "run was resumed with flags that change the optimizer or "
                "model state (e.g. adding/removing lr-decay, switching "
                "optimizers, changing model-args). Resume with the original "
                "flags (see config.json next to the checkpoints), or start "
                "a fresh --workdir for the new configuration."
            ) from e
        return restored, step

    def save_config(self, cfg: ExperimentConfig) -> None:
        cfg.save(self.dir / "config.json")

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
