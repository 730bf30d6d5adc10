"""Benchmark-dataset auto-discovery (VERDICT r2 next #9).

This build environment has zero egress and no benchmark images on disk, so
real-data parity (BASELINE.md's Set5/Set14/BSD100 table) is blocked on a
data mount appearing.  The moment one does, `sr parity --data auto` (or any
command passing ``--data auto``) must turn into the full parity table with
zero interactive work — this module is that seam: it probes the
conventional mount points for folders that look like SR benchmark sets.
"""

from __future__ import annotations

from pathlib import Path

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm"}

# conventional mount points, most specific first
_ROOTS = [
    "/data", "/datasets", "/mnt/data", "/mnt/datasets",
    "/root/data", "/root/datasets", "/tmp/data", "/tmp/datasets",
]

# canonical SR set names (case-insensitive prefix match on folder names)
_KNOWN = ["set5", "set14", "bsd100", "b100", "urban100", "t91", "91",
          "div2k", "general100", "manga109"]


def _has_images(p: Path, n: int = 2) -> bool:
    try:
        count = 0
        for f in p.iterdir():
            if f.suffix.lower() in _EXTS:
                count += 1
                if count >= n:
                    return True
    except OSError:
        return False
    return False


def discover_datasets(roots=None) -> dict[str, str]:
    """Map canonical set name -> directory for every benchmark set found.

    Scans each root (and one level of subdirectories) for folders whose
    name starts with a known SR benchmark name and which contain images.
    """
    found: dict[str, str] = {}
    for root in roots or _ROOTS:
        rp = Path(root)
        if not rp.is_dir():
            continue
        candidates = [rp] + [d for d in rp.iterdir() if d.is_dir()]
        for d in candidates:
            name = d.name.lower()
            for known in _KNOWN:
                if name.startswith(known) and _has_images(d):
                    found.setdefault(known, str(d))
        # a root that itself holds images counts as a generic train dir
        if _has_images(rp):
            found.setdefault("train", str(rp))
    return found


def resolve_data_arg(data: str, purpose: str = "train") -> str:
    """CLI seam: ``--data auto`` resolves via discovery; else passthrough.

    For ``purpose='train'`` prefers T91/DIV2K-style training corpora; for
    ``purpose='eval'`` prefers Set5.  Empty string when nothing is found
    (callers fall back to the synthetic set).
    """
    if data != "auto":
        return data
    found = discover_datasets()
    if not found:
        return ""
    if purpose == "eval":
        for k in ("set5", "set14", "bsd100", "b100"):
            if k in found:
                return found[k]
    for k in ("t91", "91", "div2k", "general100", "train"):
        if k in found:
            return found[k]
    return next(iter(found.values()))
