"""CLI end-to-end: train -> eval -> upscale round trip on tiny settings."""

import json

import numpy as np
import pytest
from PIL import Image

from ml_super_resolution_tpu.cli import main


def test_cli_train_eval_upscale(tmp_path, capsys):
    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "4", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "2",
    ])
    assert rc == 0
    assert (wd / "ckpts" / "config.json").exists()
    capsys.readouterr()

    rc = main(["eval", "--workdir", str(wd)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 4
    assert 3 < out["psnr"] < 60

    src = tmp_path / "in.png"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(src)
    dst = tmp_path / "out.png"
    rc = main([
        "upscale", "--workdir", str(wd), "--input", str(src), "--output", str(dst),
    ])
    assert rc == 0
    sr = np.asarray(Image.open(dst))
    assert sr.shape == (80, 96, 3)

    # tiled upscale gives the identical file
    dst2 = tmp_path / "out_tiled.png"
    rc = main([
        "upscale", "--workdir", str(wd), "--input", str(src),
        "--output", str(dst2), "--tiles", "4",
    ])
    assert rc == 0
    np.testing.assert_array_equal(np.asarray(Image.open(dst2)), sr)


def test_cli_eval_missing_run(tmp_path):
    with pytest.raises((SystemExit, FileNotFoundError)):
        main(["eval", "--workdir", str(tmp_path / "nope")])


@pytest.mark.slow
def test_eval_on_benchmark_folder(tmp_path, capsys):
    """Set5-style folder of PNGs drives the eval protocol end to end."""
    from ml_super_resolution_tpu.data.datasets import SyntheticImages

    set_dir = tmp_path / "Set3"
    set_dir.mkdir()
    ds = SyntheticImages(n=3, size=128, seed=5)
    for i in range(3):
        Image.fromarray(ds.decode(i)).save(set_dir / f"img{i}.png")

    wd = tmp_path / "run"
    main([
        "train", "--model", "srcnn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()
    rc = main(["eval", "--workdir", str(wd), "--data", str(set_dir)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_images"] == 3
    assert 3 < out["psnr"] < 60


@pytest.mark.slow
def test_eval_scales_flag(tmp_path, capsys):
    wd = tmp_path / "run"
    main([
        "train", "--model", "vdsr", "--scale", "3", "--multi-scale",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "24", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()
    rc = main(["eval", "--workdir", str(wd), "--scales", "2,3,4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) >= {"x2", "x3", "x4"}
    for s in ("x2", "x3", "x4"):
        assert 3 < out[s]["psnr"] < 60


@pytest.mark.slow
def test_cli_srgan_round_trip(tmp_path, capsys):
    """srgan run dirs checkpoint a GANState; eval/upscale must restore it."""
    wd = tmp_path / "gan_run"
    rc = main([
        "train", "--model", "srgan", "--scale", "4",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "2",
        "--patch-size", "32", "--dp", "1", "--pretrain-steps", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = main(["eval", "--workdir", str(wd)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 2
    assert 3 < out["psnr"] < 60

    src = tmp_path / "in.png"
    Image.fromarray(
        (np.random.default_rng(0).random((24, 24, 3)) * 255).astype(np.uint8)
    ).save(src)
    dst = tmp_path / "out.png"
    rc = main(["upscale", "--workdir", str(wd), "--input", str(src),
               "--output", str(dst)])
    assert rc == 0
    assert np.asarray(Image.open(dst)).shape == (96, 96, 3)


@pytest.mark.slow
def test_cli_tiles_2d_grid(tmp_path, capsys):
    """--tiles RxC routes through tiled_apply_2d and matches 1-device output."""
    wd = tmp_path / "run"
    main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()
    src = tmp_path / "in.png"
    # 45x53: indivisible by a 2x4 grid on both axes
    Image.fromarray(
        (np.random.default_rng(1).random((45, 53, 3)) * 255).astype(np.uint8)
    ).save(src)
    dst1, dst2 = tmp_path / "whole.png", tmp_path / "tiled2d.png"
    main(["upscale", "--workdir", str(wd), "--input", str(src), "--output", str(dst1)])
    rc = main(["upscale", "--workdir", str(wd), "--input", str(src),
               "--output", str(dst2), "--tiles", "2x4"])
    assert rc == 0
    np.testing.assert_array_equal(
        np.asarray(Image.open(dst2)), np.asarray(Image.open(dst1))
    )


def test_dataset_autodiscovery(tmp_path):
    """data/discover.py finds benchmark sets under conventional roots and
    resolve_data_arg picks train vs eval sets appropriately."""
    from PIL import Image

    from ml_super_resolution_tpu.data import discover

    root = tmp_path / "data"
    for name, n in (("Set5", 5), ("T91", 3)):
        d = root / name
        d.mkdir(parents=True)
        for i in range(n):
            Image.new("RGB", (16, 16), (i * 20, 0, 0)).save(d / f"{i}.png")
    found = discover.discover_datasets(roots=[str(root)])
    assert found["set5"].endswith("Set5")
    assert found["t91"].endswith("T91")

    import unittest.mock as mock

    with mock.patch.object(discover, "_ROOTS", [str(root)]):
        assert discover.resolve_data_arg("auto", "eval").endswith("Set5")
        assert discover.resolve_data_arg("auto", "train").endswith("T91")
        assert discover.resolve_data_arg("/explicit", "train") == "/explicit"
    with mock.patch.object(discover, "_ROOTS", [str(tmp_path / "nope")]):
        assert discover.resolve_data_arg("auto", "train") == ""


def test_model_arg_overrides_parse_and_build():
    from ml_super_resolution_tpu.cli import _parse_model_args
    from ml_super_resolution_tpu.models import build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    ov = _parse_model_args(
        ["num_blocks=32", "features=256", "res_scale=0.1", "use_bn=false"])
    assert ov == {"num_blocks": 32, "features": 256, "res_scale": 0.1,
                  "use_bn": False}
    m = build_model(ModelConfig(name="edsr", scale=4, channels=3,
                                overrides={"num_blocks": 32, "features": 256,
                                           "res_scale": 0.1}))
    assert m.num_blocks == 32 and m.features == 256 and m.res_scale == 0.1


@pytest.mark.slow
def test_cli_upscale_bf16(tmp_path, capsys):
    """--bf16 inference trunk: runs and matches f32 geometry."""
    from ml_super_resolution_tpu.cli import main

    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--eval-every", "2", "--ckpt-every", "2",
    ])
    assert rc == 0
    import numpy as np
    from PIL import Image

    src = tmp_path / "in.png"
    Image.fromarray(
        (np.random.default_rng(0).random((20, 24, 3)) * 255).astype("uint8")
    ).save(src)
    dst = tmp_path / "out.png"
    rc = main(["upscale", "--workdir", str(wd), "--input", str(src),
               "--output", str(dst), "--bf16"])
    assert rc == 0
    assert np.asarray(Image.open(dst)).shape == (40, 48, 3)


@pytest.mark.slow
def test_cli_int8_eval_and_upscale(tmp_path, capsys):
    """--int8 PTQ path: eval reports a sane quantized PSNR and upscale
    produces correct geometry (quant.py end-to-end through the CLI)."""
    from ml_super_resolution_tpu.cli import main

    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--eval-every", "2", "--ckpt-every", "2",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = main(["eval", "--workdir", str(wd), "--int8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["int8"] is True
    assert 3 < out["psnr"] < 60

    # int8 composes with the D4 self-ensemble (quantized forward under the
    # 8-transform wrapper)
    rc = main(["eval", "--workdir", str(wd), "--int8", "--ensemble"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["int8"] is True and out2["ensemble"] is True
    assert 3 < out2["psnr"] < 60 and out2["psnr"] != out["psnr"]

    src = tmp_path / "in.png"
    Image.fromarray(
        (np.random.default_rng(0).random((20, 24, 3)) * 255).astype("uint8")
    ).save(src)
    dst = tmp_path / "out.png"
    rc = main(["upscale", "--workdir", str(wd), "--input", str(src),
               "--output", str(dst), "--int8"])
    assert rc == 0
    assert np.asarray(Image.open(dst)).shape == (40, 48, 3)
