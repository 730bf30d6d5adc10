"""ctypes bindings for the native IO runtime (native/srio.cc).

Builds ``libsrio.so`` on demand (g++ + zlib, both baked into the image) and
exposes:

* :func:`decode_png` — dependency-light PNG->RGB8 decoder
* :func:`sample_tiles` — batched random tile sampling into one numpy buffer

Everything degrades gracefully: if the toolchain or library is unavailable,
``available()`` is False and callers (TileLoader) use the PIL path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsrio.so"

_ERRORS = {
    -1: "bad signature",
    -2: "unsupported png variant",
    -3: "corrupt png",
    -4: "zlib error",
    -5: "output buffer too small",
    -6: "io error",
}

_lib = None
_tried = False


class NativeUnsupported(Exception):
    """Raised for PNGs outside the native decoder's scope (caller: use PIL)."""


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.srio_png_info.restype = ctypes.c_int
    lib.srio_png_decode.restype = ctypes.c_int
    lib.srio_png_decode_file.restype = ctypes.c_int
    lib.srio_sample_tiles.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _check(rc: int) -> None:
    if rc == -2:
        raise NativeUnsupported(_ERRORS[rc])
    if rc != 0:
        raise ValueError(f"srio error: {_ERRORS.get(rc, rc)}")


def png_info(data: bytes) -> tuple[int, int]:
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    _check(lib.srio_png_info(data, ctypes.c_long(len(data)),
                             ctypes.byref(w), ctypes.byref(h)))
    return w.value, h.value


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8; NativeUnsupported for exotic variants."""
    lib = _load()
    if lib is None:
        raise NativeUnsupported("libsrio unavailable")
    w0, h0 = png_info(data)
    out = np.empty((h0, w0, 3), dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    _check(
        lib.srio_png_decode(
            data, ctypes.c_long(len(data)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_long(out.nbytes), ctypes.byref(w), ctypes.byref(h),
        )
    )
    return out


def decode_png_file(path: str | Path) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise NativeUnsupported("libsrio unavailable")
    data = Path(path).read_bytes()
    return decode_png(data)


def sample_tiles(
    img: np.ndarray, tile: int, count: int, seed: int
) -> np.ndarray:
    """(H, W, 3) uint8 -> (count, tile, tile, 3) uint8 random crops
    (reflect-padded if the image is smaller than the tile)."""
    lib = _load()
    if lib is None:
        raise NativeUnsupported("libsrio unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    out = np.empty((count, tile, tile, 3), dtype=np.uint8)
    _check(
        lib.srio_sample_tiles(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(tile),
            ctypes.c_int(count), ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
    )
    return out
