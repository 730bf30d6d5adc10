"""Y4M container I/O + video upscale route (data/video.py, cli `.y4m`)."""

import numpy as np
import pytest

from ml_super_resolution_tpu.data.video import Y4MMeta, Y4MReader, Y4MWriter


def _frames(n, h, w, hc, wc, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = rng.integers(16, 236, (h, w), dtype=np.uint8)
        cb = rng.integers(16, 241, (hc, wc), dtype=np.uint8)
        cr = rng.integers(16, 241, (hc, wc), dtype=np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("cs,div", [("C420jpeg", (2, 2)), ("C422", (2, 1)),
                                    ("C444", (1, 1))])
def test_y4m_roundtrip(tmp_path, cs, div):
    h, w = 24, 32
    hc, wc = h // div[1], w // div[0]
    frames = _frames(3, h, w, hc, wc)
    meta = Y4MMeta(width=w, height=h, rate="25:1", colorspace=cs)
    p = tmp_path / "clip.y4m"
    with Y4MWriter(p, meta) as wr:
        for f in frames:
            wr.write(*f)
    with Y4MReader(p) as rd:
        assert rd.meta.width == w and rd.meta.height == h
        assert rd.meta.rate == "25:1"
        assert rd.meta.colorspace == cs
        got = list(rd)
    assert len(got) == 3
    for (y, cb, cr), (y2, cb2, cr2) in zip(frames, got):
        np.testing.assert_array_equal(y, y2)
        np.testing.assert_array_equal(cb, cb2)
        np.testing.assert_array_equal(cr, cr2)


def test_y4m_mono_roundtrip(tmp_path):
    meta = Y4MMeta(width=16, height=8, colorspace="Cmono")
    p = tmp_path / "m.y4m"
    ys = [np.full((8, 16), v, np.uint8) for v in (0, 128, 255)]
    with Y4MWriter(p, meta) as wr:
        for y in ys:
            wr.write(y)
    with Y4MReader(p) as rd:
        got = list(rd)
    assert [g[1] for g in got] == [None] * 3
    for y, (y2, _, _) in zip(ys, got):
        np.testing.assert_array_equal(y, y2)


def test_y4m_header_validation(tmp_path):
    # odd dims under 4:2:0 rejected, unknown colorspace rejected
    with pytest.raises(ValueError):
        Y4MWriter(tmp_path / "x.y4m", Y4MMeta(width=15, height=8))
    bad = tmp_path / "bad.y4m"
    bad.write_bytes(b"YUV4MPEG2 W16 H8 F30:1 C410\nFRAME\n" + b"\x00" * 128)
    with pytest.raises(ValueError, match="colorspace"):
        Y4MReader(bad)
    trunc = tmp_path / "trunc.y4m"
    trunc.write_bytes(b"YUV4MPEG2 W16 H8 F30:1 Cmono\nFRAME\n" + b"\x00" * 17)
    with Y4MReader(trunc) as rd:
        with pytest.raises(ValueError, match="truncated"):
            list(rd)


def test_upscale_luma_matches_rgb_path():
    """Feeding a neutral-chroma frame through the RGB path must agree with
    the direct luma path (the color round trip is ~identity)."""
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.infer import upscale_frames, upscale_luma_frames
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.ops.color import ycbcr_to_rgb
    from ml_super_resolution_tpu.utils.config import ModelConfig

    m = build_model(ModelConfig(name="espcn", scale=2, channels=1))
    rng = np.random.default_rng(1)
    y = rng.integers(16, 236, (1, 12, 16, 1), dtype=np.uint8)
    v = m.init(jax.random.key(0), jnp.zeros((1, 12, 16, 1)), train=False)

    sr_y = np.asarray(upscale_luma_frames(m, v, jnp.asarray(y), "espcn", 2))

    ycc = np.concatenate([y.astype(np.float32) / 255.0,
                          np.full((1, 12, 16, 2), 128.0 / 255.0, np.float32)],
                         axis=-1)
    rgb = np.asarray(jnp.round(jnp.clip(ycbcr_to_rgb(jnp.asarray(ycc)), 0, 1)
                               * 255)).astype(np.uint8)
    sr_rgb = np.asarray(upscale_frames(m, v, jnp.asarray(rgb), "espcn", 2))
    # compare luma: BT.601 round trip through uint8 costs ~1-2 codes
    from ml_super_resolution_tpu.ops.color import rgb_to_ycbcr

    sr_y_via_rgb = np.asarray(
        jnp.round(rgb_to_ycbcr(jnp.asarray(sr_rgb).astype(jnp.float32) / 255.0)
                  [..., 0] * 255))
    # The RGB path clips in RGB space, which clamps luma to studio swing
    # [16, 235]; the luma path clips at [0, 255].  An untrained net emits
    # out-of-range values, so compare inside the studio range only.
    a = np.clip(sr_y_via_rgb, 16, 235)
    b = np.clip(sr_y[..., 0].astype(np.float64), 16, 235)
    assert np.max(np.abs(a - b)) <= 3


def test_cli_upscale_y4m_420(tmp_path, capsys):
    """End-to-end: train 2 steps, upscale a C420 clip, verify geometry +
    colorspace preservation."""
    from ml_super_resolution_tpu.cli import main

    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--eval-every", "2", "--ckpt-every", "2",
    ])
    assert rc == 0
    h, w = 24, 32
    clip = tmp_path / "in.y4m"
    frames = _frames(3, h, w, h // 2, w // 2, seed=2)
    with Y4MWriter(clip, Y4MMeta(width=w, height=h, rate="24:1")) as wr:
        for f in frames:
            wr.write(*f)
    out = tmp_path / "out.y4m"
    capsys.readouterr()
    rc = main(["upscale", "--workdir", str(wd), "--input", str(clip),
               "--output", str(out), "--batch", "2"])
    assert rc == 0
    import json

    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["frames"] == 3 and rep["colorspace"] == "C420jpeg"
    with Y4MReader(out) as rd:
        assert (rd.meta.width, rd.meta.height) == (2 * w, 2 * h)
        assert rd.meta.rate == "24:1"
        got = list(rd)
    assert len(got) == 3
    assert got[0][0].shape == (2 * h, 2 * w)
    assert got[0][1].shape == (h, w)  # 4:2:0 preserved


@pytest.mark.slow
def test_cli_upscale_y4m_rgb_model_emits_c444(tmp_path, capsys):
    from ml_super_resolution_tpu.cli import main

    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "srresnet", "--scale", "4",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "2",
        "--patch-size", "16", "--eval-every", "2", "--ckpt-every", "2",
    ])
    assert rc == 0
    clip = tmp_path / "in.y4m"
    frames = _frames(2, 16, 16, 8, 8, seed=3)
    with Y4MWriter(clip, Y4MMeta(width=16, height=16)) as wr:
        for f in frames:
            wr.write(*f)
    out = tmp_path / "out.y4m"
    capsys.readouterr()
    rc = main(["upscale", "--workdir", str(wd), "--input", str(clip),
               "--output", str(out), "--batch", "2"])
    assert rc == 0
    with Y4MReader(out) as rd:
        assert rd.meta.colorspace == "C444"
        got = list(rd)
    assert len(got) == 2
    assert got[0][0].shape == (64, 64)
    assert got[0][1].shape == (64, 64)
