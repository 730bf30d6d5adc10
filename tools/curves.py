"""Summarize run curves from metrics.jsonl for RESULTS.md.

Usage: python tools/curves.py runs/r2_srgan_x4 [runs/...]
Prints eval PSNR/SSIM trajectories and (for GAN runs) D/G loss + D-accuracy
milestones.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def summarize(run_dir: str) -> None:
    p = Path(run_dir) / "metrics.jsonl"
    if not p.exists():
        print(f"{run_dir}: no metrics.jsonl")
        return
    evals, gans, trains = [], [], []
    for line in p.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = rec.get("kind")
        if kind == "eval":
            evals.append(rec)
        elif kind == "gan":
            gans.append(rec)
        elif kind == "train":
            trains.append(rec)
    print(f"== {run_dir} ==")
    if evals:
        # dedupe by step (chunked restarts re-log), keep last occurrence
        by_step = {e["step"]: e for e in evals}
        for s in sorted(by_step):
            e = by_step[s]
            print(f"  eval {s:>6}: psnr {e['psnr']:.3f}  ssim {e['ssim']:.4f}")
    if gans:
        by_step = {g["step"]: g for g in gans}
        steps = sorted(by_step)
        picks = steps[:: max(1, len(steps) // 10)]
        if steps[-1] not in picks:
            picks.append(steps[-1])
        for s in picks:
            g = by_step[s]
            print(
                f"  gan {s:>6}: d_loss {g['d_loss']:.4g}  g_loss "
                f"{g['g_loss']:.4g}  adv {g['adversarial']:.4g}  "
                f"d_acc {g['d_real_acc']:.2f}/{g['d_fake_acc']:.2f}  "
                f"pixel {g['pixel']:.4g}  percep {g['perceptual']:.4g}"
            )
    if trains and not gans:
        last = trains[-1]
        print(f"  last train step {last['step']}  loss {last['loss']:.4g}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        summarize(d)
