"""Threaded HR-tile loader: decode once, crop many, prefetch to device.

SURVEY §7 "host ingest throughput": image decode is the host-bound cost, so
each decoded image is amortized over ``patches_per_tile`` random tiles, and
worker threads keep a bounded queue of ready uint8 batches ahead of the
device.  PIL decode releases the GIL, so threads parallelize the actual work.

The loader yields fixed-shape ``(batch, tile, tile, 3)`` uint8 numpy arrays —
the *only* host->device transfer in the training loop; everything downstream
is ``ops/patches.py`` inside the jitted step (SURVEY §3.5: ~0 extra boundary
crossings per step).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

__all__ = ["TileLoader"]


class TileLoader:
    """Infinite iterator of uint8 HR tile batches from a dataset.

    dataset: object with ``__len__`` and ``decode(i) -> uint8 HWC array``.
    Images smaller than ``tile_size`` are reflect-padded up; tiles are random
    crops (host rng — cheap; the *training* crop/augment randomness happens
    on device with jax PRNG, so host randomness only shuffles data order and
    never affects reproducibility of the jitted step given the same tiles).

    ``deterministic=True`` pins the batch stream: one producer thread, one
    seeded permutation stream with epoch boundaries — two loaders with the
    same (dataset, seed, shapes) yield identical batch sequences, making
    whole training runs bit-reproducible end to end (SURVEY §5.2; the jitted
    step is already deterministic given the same tiles).  The default keeps
    ``num_workers`` racing on the shared queue for throughput.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        tile_size: int = 256,
        patches_per_tile: int = 4,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        cache_bytes: int = 2 << 30,
        deterministic: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.tile_size = tile_size
        self.patches_per_tile = max(1, patches_per_tile)
        self.deterministic = deterministic
        self.num_workers = 1 if deterministic else max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self._q: queue.Queue[np.ndarray] = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        # Decoded-image cache: decode cost dominates on few-core hosts and
        # SR datasets are small (T91 ~18 MB decoded) — keep decoded arrays
        # up to a byte budget so epochs after the first skip decode entirely.
        self._cache: dict[int, np.ndarray] = {}
        self._cache_bytes = 0
        self._cache_cap = max(0, cache_bytes)
        self._cache_lock = threading.Lock()

    def _decode_cached(self, i: int) -> np.ndarray:
        with self._cache_lock:
            img = self._cache.get(i)
        if img is not None:
            return img
        img = self.dataset.decode(i)
        if self._cache_cap:
            with self._cache_lock:
                if i not in self._cache and self._cache_bytes + img.nbytes <= self._cache_cap:
                    self._cache[i] = img
                    self._cache_bytes += img.nbytes
        return img

    # ---- worker side -----------------------------------------------------
    def _tiles_from_image(self, img: np.ndarray, rng: np.random.Generator):
        t = self.tile_size
        h, w = img.shape[:2]
        if h < t or w < t:
            pad_h, pad_w = max(0, t - h), max(0, t - w)
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            h, w = img.shape[:2]
        for _ in range(self.patches_per_tile):
            y = int(rng.integers(0, h - t + 1))
            x = int(rng.integers(0, w - t + 1))
            yield img[y : y + t, x : x + t]

    def _worker(self, wid: int):
        rng = np.random.default_rng(self.seed * 10007 + wid)
        n = len(self.dataset)
        batch: list[np.ndarray] = []
        while not self._stop.is_set():
            for i in rng.permutation(n):
                try:
                    img = self._decode_cached(int(i))
                except Exception:
                    continue  # unreadable file: skip, never kill training
                for tile in self._tiles_from_image(img, rng):
                    batch.append(tile)
                    if len(batch) == self.batch_size:
                        out = np.stack(batch)
                        batch = []
                        while not self._stop.is_set():
                            try:
                                self._q.put(out, timeout=0.25)
                                break
                            except queue.Full:
                                continue
                if self._stop.is_set():
                    return

    # ---- consumer side ---------------------------------------------------
    def start(self) -> "TileLoader":
        if self._threads:
            return self
        for wid in range(self.num_workers):
            th = threading.Thread(target=self._worker, args=(wid,), daemon=True)
            th.start()
            self._threads.append(th)
        return self

    def stop(self) -> None:
        self._stop.set()
        # drain so workers blocked on put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator[np.ndarray]:
        self.start()
        while True:
            yield self._q.get()

    def __enter__(self) -> "TileLoader":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
