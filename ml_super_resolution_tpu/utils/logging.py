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
        self._dir: Path | None = None
        if out_dir is not None:
            p = Path(out_dir)
            self._dir = p
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

    def log_images(self, kind: str, step: int, **images: Any) -> None:
        """Image summaries (the reference's ``tf.summary`` image leg,
        SURVEY §5.5): each HWC uint8 array lands as a PNG under
        ``<dir>/previews/`` and, when the TB mirror is on, as a
        ``tf.summary.image``."""
        if self._dir is None:
            return
        import numpy as np
        from PIL import Image

        pdir = self._dir / "previews"
        pdir.mkdir(exist_ok=True)
        for name, arr in images.items():
            a = np.asarray(arr)
            if a.ndim == 3 and a.shape[-1] == 1:
                a = a[..., 0]  # PIL grayscale
            Image.fromarray(a).save(pdir / f"{step:08d}_{kind}_{name}.png")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for name, arr in images.items():
                    a = np.asarray(arr)
                    if a.ndim == 3:
                        a = a[None]
                    tf.summary.image(f"{kind}/{name}", a, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
