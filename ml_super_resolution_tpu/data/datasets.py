"""Datasets: directory-of-images (the reference's layout) + synthetic fallback.

The reference walked a dataset directory and PIL-decoded images host-side
(SURVEY §2a "Data pipeline").  Same contract here: any folder of
PNG/JPEG/BMP HR images is a training or eval set (T91/DIV2K/Set5/Set14/BSD100
all ship as such folders).

``SyntheticImages`` exists because this build environment has no benchmark
images on disk and zero egress: it renders deterministic, band-limited
texture+edge images so training/eval smoke runs and benchmarks are
reproducible without real data.  It is clearly not a substitute for Set5
PSNR parity — see BASELINE.md caveats.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp"}


class ImageFolder:
    """Folder of HR images; decodes to uint8 RGB HWC numpy arrays."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.paths: list[Path] = sorted(
            p for p in self.root.rglob("*") if p.suffix.lower() in _EXTS
        )
        if not self.paths:
            raise FileNotFoundError(f"no images under {self.root}")

    def __len__(self) -> int:
        return len(self.paths)

    def decode(self, i: int) -> np.ndarray:
        path = self.paths[i]
        if path.suffix.lower() == ".png":
            # native zlib decoder (native/srio.cc); PIL for exotic variants
            try:
                from ml_super_resolution_tpu.data import native

                if native.available():
                    return native.decode_png_file(path)
            except Exception:
                pass
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self.decode(i)


class SyntheticImages:
    """Deterministic procedural 'photos': gradients, edges, ridges, texture.

    Rendered fresh from a per-index seed — unlimited, reproducible, and with
    enough structure (oriented edges + band-limited texture) that SR nets
    trained on them beat bicubic on held-out synthetic images.
    """

    def __init__(self, n: int = 800, size: int = 256, seed: int = 0,
                 version: int = 2):
        # version 2 (round 3) adds dense sharp structure — square-wave
        # gratings, concentric rings, glyph grids — because the v1 content's
        # high-frequency ceiling (~24.6-24.8 dB at x4) left every model
        # within +0.4 dB of bicubic: the eval could no longer rank models at
        # x4.  v1 stays reachable for reproducing round-2 numbers.
        self.n, self.size, self.seed = n, size, seed
        self.version = version
        self.paths = [f"synthetic://{seed}/{i}" for i in range(n)]

    def __len__(self) -> int:
        return self.n

    def decode(self, i: int) -> np.ndarray:
        h = hashlib.sha256(f"{self.seed}:{i}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float64) / s
        img = np.zeros((s, s, 3))
        # smooth background gradient per channel
        for c in range(3):
            a, b, ph = rng.uniform(-1, 1, 3)
            img[..., c] = 0.5 + 0.25 * (a * xx + b * yy + 0.3 * np.sin(6.28 * (ph + xx * rng.integers(1, 4))))
        # oriented sinusoidal ridges incl. near-Nyquist detail (SR must
        # hallucinate these; bicubic cannot)
        for _ in range(6):
            th = rng.uniform(0, np.pi)
            freq = rng.uniform(4, s * 0.35)
            phase = rng.uniform(0, 6.28)
            ridge = np.sin(6.28 * freq * (xx * np.cos(th) + yy * np.sin(th)) + phase)
            img += 0.07 * ridge[..., None] * rng.uniform(0.3, 1.0, 3)
        # sharp polygonal edges (step content — what SR lives on)
        for _ in range(6):
            cx, cy = rng.uniform(0.1, 0.9, 2)
            th = rng.uniform(0, np.pi)
            r = rng.uniform(0.05, 0.35)
            mask = ((xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)) ** 2 + (
                -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
            ) ** 2 * rng.uniform(1, 8) < r * r
            img[mask] = img[mask] * 0.5 + rng.uniform(0, 1, 3) * 0.5
        # hard-edged rectangles + thin strokes (text/structure-like content)
        for _ in range(8):
            x0, y0 = rng.integers(0, s - 8, 2)
            w_, h_ = rng.integers(2, max(3, s // 6), 2)
            fill = rng.uniform(0, 1, 3)
            img[y0 : min(s, y0 + h_), x0 : min(s, x0 + w_)] = fill
        for _ in range(6):
            x0 = rng.integers(0, s - 2)
            y0 = rng.integers(0, s - 2)
            ln = int(rng.integers(6, s // 2))
            thick = int(rng.integers(1, 3))
            fill = rng.uniform(0, 1, 3)
            if rng.random() < 0.5:
                img[y0 : y0 + thick, x0 : min(s, x0 + ln)] = fill
            else:
                img[y0 : min(s, y0 + ln), x0 : x0 + thick] = fill
        if self.version >= 2:
            # square-wave gratings: sharp-edged periodic bars whose harmonics
            # exceed the LR Nyquist at x4 — structure a prior can restore but
            # bicubic must blur.  Placed as rectangular patches.
            for _ in range(3):
                th = rng.uniform(0, np.pi)
                freq = rng.uniform(4, max(5, s * 0.12))
                phase = rng.uniform(0, 6.28)
                u = xx * np.cos(th) + yy * np.sin(th)
                grate = np.sign(np.sin(6.28 * freq * u + phase))
                x0, y0 = rng.uniform(0.0, 0.6, 2)
                w_, h_ = rng.uniform(0.2, 0.4, 2)
                mask = (xx >= x0) & (xx < x0 + w_) & (yy >= y0) & (yy < y0 + h_)
                amp = rng.uniform(0.15, 0.35)
                img[mask] = np.clip(
                    img[mask] + amp * grate[mask][:, None], 0, 1
                )
            # concentric rings: radial square wave inside a disk (curved sharp
            # edges at continuously varying orientation)
            cx, cy = rng.uniform(0.25, 0.75, 2)
            rr = np.hypot(xx - cx, yy - cy)
            freq = rng.uniform(5, max(6, s * 0.08))
            rings = np.sign(np.sin(6.28 * freq * rr))
            disk = rr < rng.uniform(0.12, 0.3)
            amp = rng.uniform(0.15, 0.3)
            img[disk] = np.clip(img[disk] + amp * rings[disk][:, None], 0, 1)
            # glyph grid: text-like cells of 2-4 thin strokes each — dense,
            # high-contrast, orientation-mixed strokes at character scale
            g = int(rng.integers(10, 16))
            gx0, gy0 = rng.integers(0, s // 3, 2)
            gw = int(rng.integers(s // 3, s // 2))
            gh = int(rng.integers(s // 4, s // 2))
            ink = rng.uniform(0, 0.25, 3)
            paper = rng.uniform(0.75, 1.0, 3)
            img[gy0 : min(s, gy0 + gh), gx0 : min(s, gx0 + gw)] = paper
            for cy_ in range(gy0, min(s - g, gy0 + gh - g), g):
                for cx_ in range(gx0, min(s - g, gx0 + gw - g), g):
                    for _ in range(int(rng.integers(2, 5))):
                        sx = cx_ + int(rng.integers(1, g - 2))
                        sy = cy_ + int(rng.integers(1, g - 2))
                        ln = int(rng.integers(3, g - 1))
                        if rng.random() < 0.5:
                            img[sy : sy + 1, sx : min(s, sx + ln)] = ink
                        else:
                            img[sy : min(s, sy + ln), sx : sx + 1] = ink
        # one fine checkerboard patch (the classic aliasing probe)
        cs = int(rng.integers(1, 3))
        px, py = rng.integers(0, s // 2, 2)
        sz = int(rng.integers(s // 8, s // 4))
        checker = (((np.arange(sz) // cs)[:, None] + (np.arange(sz) // cs)[None, :]) % 2)
        lo, hi = sorted(rng.uniform(0, 1, 2))
        img[py : py + sz, px : px + sz] = (lo + (hi - lo) * checker)[..., None]
        # mild texture
        img += rng.normal(0, 0.015, (s, s, 3))
        return (np.clip(img, 0, 1) * 255).round().astype(np.uint8)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self.decode(i)


def make_dataset(root: str | Path | None, **synth_kw):
    """Folder if it exists and has images, else the synthetic fallback."""
    if root:
        p = Path(root)
        if p.exists():
            return ImageFolder(p)
    return SyntheticImages(**synth_kw)


def load_eval_images(
    root: str | Path | None, n_synthetic: int = 5, size: int = 256, seed: int = 123
) -> Sequence[np.ndarray]:
    """Benchmark set: all images of a folder (Set5/Set14/BSD100 layout) or a
    deterministic synthetic pseudo-Set5."""
    ds = make_dataset(root, n=n_synthetic, size=size, seed=seed)
    return [ds.decode(i) for i in range(len(ds))]
