"""sr parity runbook: benchmark-set discovery, bicubic anchors, run scoring."""

import json

import numpy as np
from PIL import Image

from ml_super_resolution_tpu.cli import main
from ml_super_resolution_tpu.data.datasets import SyntheticImages
from ml_super_resolution_tpu.parity import (
    PAPER_PSNR,
    discover_sets,
    render_markdown,
    run_parity,
)


def _make_set(root, name, n=2, seed=9):
    d = root / name
    d.mkdir(parents=True)
    ds = SyntheticImages(n=n, size=96, seed=seed)
    for i in range(n):
        Image.fromarray(ds.decode(i)).save(d / f"{i}.png")
    return d


def test_discover_sets_and_aliases(tmp_path):
    _make_set(tmp_path, "Set5")
    _make_set(tmp_path, "B100", seed=10)
    found = discover_sets(tmp_path)
    assert set(found) == {"set5", "bsd100"}
    # a single set folder works too
    assert set(discover_sets(tmp_path / "Set5")) == {"set5"}


def test_parity_bicubic_only(tmp_path):
    _make_set(tmp_path, "Set5")
    report = run_parity(tmp_path)
    row = report["set5"]["bicubic"]
    assert set(row) >= {"x2", "x3", "x4"}
    for sk in ("x2", "x3", "x4"):
        assert 3 < row[sk]["psnr"] < 60
        # paper anchor attached where published
        assert row[sk]["paper"] == PAPER_PSNR[("bicubic", "set5", int(sk[1]))]
        assert "delta" in row[sk]


def test_parity_cli_with_run(tmp_path, capsys):
    _make_set(tmp_path / "bench", "Set5")
    wd = tmp_path / "run"
    main([
        "train", "--model", "espcn", "--scale", "4",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()
    out_md = tmp_path / "parity.md"
    rc = main([
        "parity", "--data", str(tmp_path / "bench"),
        "--workdirs", str(wd), "--out", str(out_md),
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    report = json.loads(lines[-1])
    run_row = report["set5"][str(wd)]
    assert run_row["model"] == "espcn"
    assert 3 < run_row["x4"]["psnr"] < 60
    assert run_row["x4"]["paper"] == PAPER_PSNR[("espcn", "set5", 4)]
    md = out_md.read_text()
    assert "| set5 | bicubic | x4 |" in md
    assert "espcn" in md
    # markdown renderer is pure
    assert render_markdown(report) in md + "\n"
    # D4 self-ensemble rows (EDSR+ protocol) through the same runbook
    rep_ens = run_parity(tmp_path / "bench", [str(wd)], ensemble=True)
    row_ens = rep_ens["set5"][str(wd)]
    assert row_ens["ensemble"] is True
    assert np.isfinite(row_ens["x4"]["psnr"])
    assert row_ens["x4"]["psnr"] != run_row["x4"]["psnr"]
