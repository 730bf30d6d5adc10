"""Structured JSONL metrics (replaces the reference's tf.summary, SURVEY §5.5)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import IO, Any


class MetricsLogger:
    """Appends one JSON object per event to ``<dir>/metrics.jsonl`` and
    optionally mirrors a compact line to stdout."""

    def __init__(
        self, out_dir: str | Path | None, echo: bool = True, tensorboard: bool = False
    ):
        self.echo = echo
        self._fh: IO[str] | None = None
        self._tb = None
        if out_dir is not None:
            p = Path(out_dir)
            p.mkdir(parents=True, exist_ok=True)
            self._fh = (p / "metrics.jsonl").open("a")
            if tensorboard:
                try:  # tf only needed for the optional TB mirror
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(str(p / "tb"))
                except Exception:
                    self._tb = None

    def log(self, kind: str, step: int, **values: Any) -> None:
        rec = {"kind": kind, "step": step, "time": time.time(), **values}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in values.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(f"{kind}/{k}", v, step=step)
        if self.echo:
            vals = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in values.items()
            )
            print(f"[{kind} {step}] {vals}", file=sys.stderr)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
