"""One-command paper-protocol parity runbook (BASELINE.md table).

The driver's north star is PSNR parity on the public benchmark sets
(BASELINE.json:2,5) — Set5/Set14/BSD100, Y-channel, ``scale``-px shave,
Matlab-imresize bicubic.  This environment has no benchmark images (zero
egress), so the runbook exists to make parity a *zero-code* event: the
moment a data mount appears,

    sr parity --data /mnt/benchmarks --workdirs runs/a,runs/b [--best]

emits the BASELINE.md comparison table — measured PSNR/SSIM per (model,
set, scale) next to the published paper numbers, plus the bicubic anchor
row that validates the protocol itself (if our bicubic disagrees with the
literature bicubic by more than ~0.05 dB, the resize/metric convention is
wrong and model numbers are meaningless — SURVEY §7 "hard parts" #1).

``--data`` points at a directory of benchmark-set folders (``Set5/``,
``Set14/``, ``B100``/``BSD100/`` — case-insensitive), or directly at one
set folder.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

# Published Y-PSNR (dB) per (model, set, scale) — the papers' own tables,
# mirrored from BASELINE.md (recalled offline; re-verify decimals against
# the arXiv PDFs before using as a hard gate — BASELINE.md caveat).
PAPER_PSNR: dict[tuple[str, str, int], float] = {
    ("bicubic", "set5", 2): 33.66, ("bicubic", "set5", 3): 30.39,
    ("bicubic", "set5", 4): 28.42,
    ("bicubic", "set14", 2): 30.24, ("bicubic", "set14", 3): 27.55,
    ("bicubic", "set14", 4): 26.00,
    ("bicubic", "bsd100", 2): 29.56, ("bicubic", "bsd100", 3): 27.21,
    ("bicubic", "bsd100", 4): 25.96,
    ("srcnn", "set5", 2): 36.66, ("srcnn", "set5", 3): 32.75,
    ("srcnn", "set5", 4): 30.49,
    ("srcnn", "set14", 2): 32.45, ("srcnn", "set14", 3): 29.30,
    ("srcnn", "set14", 4): 27.50,
    ("espcn", "set5", 3): 33.13, ("espcn", "set5", 4): 30.90,
    ("espcn", "set14", 3): 29.49, ("espcn", "set14", 4): 27.73,
    ("vdsr", "set5", 2): 37.53, ("vdsr", "set5", 3): 33.66,
    ("vdsr", "set5", 4): 31.35,
    ("vdsr", "bsd100", 2): 31.90, ("vdsr", "bsd100", 3): 28.82,
    ("vdsr", "bsd100", 4): 27.29,
    ("srresnet", "set5", 4): 32.05,
    ("srgan", "set5", 4): 29.40, ("srgan", "set14", 4): 26.02,
}

_SET_ALIASES = {"b100": "bsd100", "bsds100": "bsd100"}


def _canon_set(name: str) -> str:
    n = name.lower().replace("_", "")
    return _SET_ALIASES.get(n, n)


def discover_sets(data_root: str | Path) -> dict[str, Path]:
    """Map canonical set name -> folder.  Accepts a root of set folders or a
    single set folder."""
    root = Path(data_root)
    subdirs = [p for p in sorted(root.iterdir()) if p.is_dir()] if root.is_dir() else []
    image_subdirs = {}
    for d in subdirs:
        try:
            from ml_super_resolution_tpu.data.datasets import ImageFolder

            ImageFolder(d)
        except FileNotFoundError:
            continue
        image_subdirs[_canon_set(d.name)] = d
    if image_subdirs:
        return image_subdirs
    return {_canon_set(root.name): root}  # a single set folder


def bicubic_eval(images: Sequence[np.ndarray], scale: int) -> dict[str, float]:
    """Protocol bicubic anchor: Y-channel PSNR/SSIM at ``scale``."""
    import jax.numpy as jnp

    from ml_super_resolution_tpu.ops.metrics import psnr, ssim
    from ml_super_resolution_tpu.ops.patches import eval_pair
    from ml_super_resolution_tpu.ops.resize import imresize

    ps, ss = [], []
    for img in images:
        lr, hr = eval_pair(jnp.asarray(img), scale, y_only=True, lr_space=True)
        sr = jnp.clip(imresize(lr, scale=float(scale)), 0.0, 1.0)
        ps.append(float(psnr(sr, hr, border=scale)))
        ss.append(float(ssim(sr, hr, border=scale)))
    return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}


def run_parity(
    data_root: str | Path,
    workdirs: Sequence[str] = (),
    best: bool = False,
    sets: Sequence[str] = (),
    ensemble: bool = False,
    int8: bool = False,
) -> dict:
    """Evaluate bicubic + every run dir on every benchmark set found.

    Returns ``{set: {"bicubic": {x2: {...}}, "<workdir>": {...}}}`` with
    per-entry ``paper`` / ``delta`` fields where a published number exists.
    """
    from ml_super_resolution_tpu.cli import _load_run
    from ml_super_resolution_tpu.data.datasets import load_eval_images

    found = discover_sets(data_root)
    if sets:
        want = {_canon_set(s) for s in sets}
        found = {k: v for k, v in found.items() if k in want}
    if not found:
        raise SystemExit(f"no benchmark sets under {data_root}")

    runs = []
    for wd in workdirs:
        trainer, state, step, cfg = _load_run(wd, best=best)
        scales = tuple(cfg.data.scales) or (cfg.model.scale,)
        runs.append((wd, trainer, state, step, cfg, scales))
    all_scales = sorted({s for *_, sc in runs for s in sc} or {2, 3, 4})

    report: dict = {}
    for set_name, folder in found.items():
        images = load_eval_images(folder)
        entry: dict = {"n_images": len(images), "bicubic": {}}
        for s in all_scales:
            r = bicubic_eval(images, s)
            paper = PAPER_PSNR.get(("bicubic", set_name, s))
            if paper is not None:
                r["paper"] = paper
                r["delta"] = round(r["psnr"] - paper, 3)
            entry["bicubic"][f"x{s}"] = r
        for wd, trainer, state, step, cfg, scales in runs:
            rd: dict = {"model": cfg.model.name, "step": step}
            if ensemble:
                rd["ensemble"] = True
            if int8:
                rd["int8"] = True
            for s in scales:
                r = trainer.evaluate(state, images, scale=s,
                                     ensemble=ensemble, int8=int8)
                paper = PAPER_PSNR.get((cfg.model.name, set_name, s))
                if paper is not None:
                    r["paper"] = paper
                    r["delta"] = round(r["psnr"] - paper, 3)
                rd[f"x{s}"] = r
            entry[wd] = rd
        report[set_name] = entry
    return report


def render_markdown(report: dict) -> str:
    """BASELINE.md-style comparison table."""
    lines = [
        "# Parity report (paper protocol: Y-PSNR, scale-px shave, "
        "Matlab bicubic)",
        "",
        "| set | config | scale | PSNR (dB) | SSIM | paper | delta |",
        "|---|---|---|---|---|---|---|",
    ]
    for set_name, entry in report.items():
        for config, scales in entry.items():
            if config == "n_images":
                continue
            label = config if config == "bicubic" else (
                f"{scales.get('model', '?')} ({config})"
            )
            for sk, r in scales.items():
                if not sk.startswith("x"):
                    continue
                paper = r.get("paper")
                delta = r.get("delta")
                lines.append(
                    f"| {set_name} | {label} | {sk} | {r['psnr']:.2f} | "
                    f"{r['ssim']:.4f} | "
                    f"{paper if paper is not None else '—'} | "
                    f"{f'{delta:+.3f}' if delta is not None else '—'} |"
                )
    lines.append("")
    lines.append(
        "Gate (BASELINE.json:5): model delta within ±0.05 dB of the paper "
        "number. The bicubic rows validate the protocol itself first."
    )
    return "\n".join(lines)


def main_parity(args) -> int:
    report = run_parity(
        args.data,
        [w for w in args.workdirs.split(",") if w],
        best=args.best,
        sets=[s for s in args.sets.split(",") if s],
        ensemble=getattr(args, "ensemble", False),
        int8=getattr(args, "int8", False),
    )
    md = render_markdown(report)
    if args.out:
        Path(args.out).write_text(md + "\n")
    print(md)
    print(json.dumps(report))
    return 0
