"""Native IO runtime goldens: C++ PNG decode vs PIL, tile sampler contracts."""

import io

import numpy as np
import pytest
from PIL import Image

from ml_super_resolution_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsrio could not be built"
)


def _png_bytes(arr: np.ndarray, mode: str) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize("shape,mode", [
    ((37, 53, 3), "RGB"),
    ((64, 64, 3), "RGB"),
    ((40, 30), "L"),
    ((24, 31, 4), "RGBA"),
])
def test_decode_matches_pil(rng, shape, mode):
    arr = (rng.random(shape) * 255).astype(np.uint8)
    data = _png_bytes(arr, mode)
    got = native.decode_png(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_decode_palette_png(rng):
    arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    im = Image.fromarray(arr).quantize(colors=64)  # palette mode "P"
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    data = buf.getvalue()
    got = native.decode_png(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_decode_16bit_falls_back(rng):
    arr = (rng.random((16, 16)) * 65535).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="I;16").save(buf, format="PNG")
    with pytest.raises(native.NativeUnsupported):
        native.decode_png(buf.getvalue())


def test_decode_garbage_raises():
    with pytest.raises((native.NativeUnsupported, ValueError)):
        native.decode_png(b"not a png at all")


def test_png_file_roundtrip(tmp_path, rng):
    arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    got = native.decode_png_file(p)
    np.testing.assert_array_equal(got, arr)


def test_sample_tiles_contract(rng):
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    tiles = native.sample_tiles(img, tile=32, count=8, seed=7)
    assert tiles.shape == (8, 32, 32, 3)
    # every tile is an exact sub-window
    for t in tiles[:3]:
        found = False
        for y in range(0, 100 - 32 + 1):
            idx = np.where(
                (img[y : y + 1, : 120 - 31, 0] == t[0, 0, 0])
                & (img[y : y + 1, : 120 - 31, 1] == t[0, 0, 1])
            )[1]
            for x in idx:
                if np.array_equal(img[y : y + 32, x : x + 32], t):
                    found = True
                    break
            if found:
                break
        assert found
    # deterministic in seed
    again = native.sample_tiles(img, tile=32, count=8, seed=7)
    np.testing.assert_array_equal(tiles, again)
    other = native.sample_tiles(img, tile=32, count=8, seed=8)
    assert not np.array_equal(tiles, other)


def test_sample_tiles_small_image_reflects(rng):
    img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    tiles = native.sample_tiles(img, tile=32, count=2, seed=1)
    assert tiles.shape == (2, 32, 32, 3)
    # top-left region must be the original image
    np.testing.assert_array_equal(tiles[0, :20, :24], img)
