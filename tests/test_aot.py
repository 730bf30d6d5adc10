"""AOT export artifacts (aot.py): export -> load -> call -> serve.

The artifact must reproduce the direct checkpoint inference to within one
uint8 rounding step (two separately compiled programs may fuse the final
round differently), enforce its shape contract, and serve over HTTP with
zero model code on the serving path.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from ml_super_resolution_tpu.cli import _load_run, main


@pytest.fixture(scope="module")
def espcn_run(tmp_path_factory):
    wd = tmp_path_factory.mktemp("aot") / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    assert rc == 0
    return wd


def test_export_load_call_matches_direct(espcn_run, tmp_path, capsys):
    import jax.numpy as jnp

    from ml_super_resolution_tpu.aot import load_artifact
    from ml_super_resolution_tpu.infer import upscale_frames

    art = tmp_path / "m.srx"
    rc = main(["export", "--workdir", str(espcn_run), "--output", str(art),
               "--size", "24x32", "--batches", "1,2"])
    assert rc == 0
    hdr_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hdr_out["batches"] == [1, 2]
    assert hdr_out["platforms"] == ["cpu", "tpu"]

    header, fn = load_artifact(art)
    assert (header["model"], header["scale"]) == ("espcn", 2)
    x = (np.random.default_rng(3).random((2, 24, 32, 3)) * 255).astype(
        np.uint8)
    out = fn(x)
    assert out.shape == (2, 48, 64, 3) and out.dtype == np.uint8

    trainer, state, _, cfg = _load_run(str(espcn_run))
    v = {"params": trainer.eval_params(state)}
    direct = np.asarray(upscale_frames(
        trainer.model, v, jnp.asarray(x), cfg.model.name, cfg.model.scale))
    diff = np.abs(out.astype(int) - direct.astype(int))
    assert diff.max() <= 1, f"artifact diverges: maxdiff={diff.max()}"

    # shape contract
    with pytest.raises(ValueError, match="batch 3 not exported"):
        fn(np.zeros((3, 24, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="artifact serves"):
        fn(np.zeros((1, 16, 32, 3), np.uint8))


def test_export_int8_artifact(espcn_run, tmp_path, capsys):
    from ml_super_resolution_tpu.aot import load_artifact

    art = tmp_path / "m8.srx"
    rc = main(["export", "--workdir", str(espcn_run), "--output", str(art),
               "--size", "24x32", "--batches", "1", "--int8"])
    assert rc == 0
    capsys.readouterr()
    header, fn = load_artifact(art)
    assert header["int8"] is True
    x = (np.random.default_rng(4).random((1, 24, 32, 3)) * 255).astype(
        np.uint8)
    out = fn(x)
    assert out.shape == (1, 48, 64, 3) and out.dtype == np.uint8
    # int8-quantized, so only loosely tied to f32 — but must be an image,
    # not garbage: most pixels within a few uint8 steps of the f32 artifact
    art32 = tmp_path / "m32.srx"
    main(["export", "--workdir", str(espcn_run), "--output", str(art32),
          "--size", "24x32", "--batches", "1"])
    capsys.readouterr()
    _, f32fn = load_artifact(art32)
    ref = f32fn(x)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert np.percentile(err, 99) <= 8 and err.mean() < 2.0


def test_bad_magic_rejected(tmp_path):
    from ml_super_resolution_tpu.aot import load_artifact

    p = tmp_path / "junk.srx"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="not an SRX1 artifact"):
        load_artifact(p)


def test_serve_from_export_http(espcn_run, tmp_path, capsys):
    from ml_super_resolution_tpu.serve import serve

    art = tmp_path / "m.srx"
    main(["export", "--workdir", str(espcn_run), "--output", str(art),
          "--size", "24x32", "--batches", "1,2,4"])
    capsys.readouterr()

    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(None, None, None),
        kwargs=dict(port=8619, ready_event=ready, artifact=str(art)),
        daemon=True)
    th.start()
    assert ready.wait(timeout=60)

    with urllib.request.urlopen("http://127.0.0.1:8619/healthz",
                                timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["artifact"].endswith("m.srx")
    assert (health["model"], health["scale"]) == ("espcn", 2)

    img = (np.random.default_rng(0).random((24, 32, 3)) * 255).astype(
        np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(
        "http://127.0.0.1:8619/upscale", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        sr = np.asarray(Image.open(io.BytesIO(r.read())))
    assert sr.shape == (48, 64, 3)

    # wrong geometry -> clean 500, server stays up
    img2 = (np.random.default_rng(1).random((16, 32, 3)) * 255).astype(
        np.uint8)
    buf2 = io.BytesIO()
    Image.fromarray(img2).save(buf2, format="PNG")
    req2 = urllib.request.Request(
        "http://127.0.0.1:8619/upscale", data=buf2.getvalue(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req2, timeout=120)
    assert ei.value.code == 500
    with urllib.request.urlopen("http://127.0.0.1:8619/healthz",
                                timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_export_symbolic_batch(espcn_run, tmp_path, capsys):
    """--batches any: one shape-polymorphic program serves every batch size
    and serves over HTTP with the standard bucket ladder."""
    from ml_super_resolution_tpu.aot import load_artifact
    from ml_super_resolution_tpu.serve import serve

    art = tmp_path / "any.srx"
    rc = main(["export", "--workdir", str(espcn_run), "--output", str(art),
               "--size", "24x32", "--batches", "any"])
    assert rc == 0
    hdr_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hdr_out["batches"] == "any"
    assert len(hdr_out["blob_sizes"]) == 1

    header, fn = load_artifact(art)
    for n in (1, 3, 7):
        out = fn((np.random.default_rng(n).random((n, 24, 32, 3)) * 255)
                 .astype(np.uint8))
        assert out.shape == (n, 48, 64, 3)
    with pytest.raises(ValueError, match="artifact serves"):
        fn(np.zeros((1, 16, 32, 3), np.uint8))

    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(None, None, None),
        kwargs=dict(port=8626, ready_event=ready, artifact=str(art),
                    max_batch=4), daemon=True)
    th.start()
    assert ready.wait(timeout=60)
    img = (np.random.default_rng(0).random((24, 32, 3)) * 255).astype(
        np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(
        "http://127.0.0.1:8626/upscale", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert np.asarray(Image.open(io.BytesIO(r.read()))).shape == (48, 64, 3)


def test_serve_reload_artifact(espcn_run, tmp_path, capsys):
    """POST /reload: zero-downtime artifact swap — new geometry serves,
    bad reloads are rejected and the old program keeps serving."""
    from ml_super_resolution_tpu.serve import serve

    art_a = tmp_path / "a.srx"
    art_b = tmp_path / "b.srx"
    main(["export", "--workdir", str(espcn_run), "--output", str(art_a),
          "--size", "24x32", "--batches", "1,2"])
    main(["export", "--workdir", str(espcn_run), "--output", str(art_b),
          "--size", "16x16", "--batches", "any"])
    capsys.readouterr()

    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(None, None, None),
        kwargs=dict(port=8629, ready_event=ready, artifact=str(art_a)),
        daemon=True)
    th.start()
    assert ready.wait(timeout=60)

    def post_png(shape):
        img = (np.random.default_rng(0).random(shape) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            "http://127.0.0.1:8629/upscale", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return np.asarray(Image.open(io.BytesIO(r.read())))

    assert post_png((24, 32, 3)).shape == (48, 64, 3)

    # bad reload: 400, old artifact keeps serving
    bad = urllib.request.Request(
        "http://127.0.0.1:8629/reload?path=/nope.srx", data=b"",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=60)
    assert ei.value.code == 400
    assert post_png((24, 32, 3)).shape == (48, 64, 3)

    # good reload: new geometry serves, healthz reflects the swap
    from urllib.parse import quote

    req = urllib.request.Request(
        f"http://127.0.0.1:8629/reload?path={quote(str(art_b))}", data=b"",
        method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["reloaded"].endswith("b.srx") and out["batches"] == "any"
    assert post_png((16, 16, 3)).shape == (32, 32, 3)
    with urllib.request.urlopen("http://127.0.0.1:8629/healthz",
                                timeout=30) as r:
        assert json.loads(r.read())["artifact"].endswith("b.srx")
    # the old geometry now 500s per request; server stays healthy
    with pytest.raises(urllib.error.HTTPError) as ei:
        post_png((24, 32, 3))
    assert ei.value.code == 500
