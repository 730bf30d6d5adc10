"""Serving endpoint test: real HTTP round trip on CPU."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from ml_super_resolution_tpu.cli import main
from ml_super_resolution_tpu.serve import serve
from ml_super_resolution_tpu.train.trainer import Trainer
from ml_super_resolution_tpu.utils.config import ExperimentConfig


def test_serve_upscales_over_http(tmp_path, capsys):
    wd = tmp_path / "run"
    main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()

    from ml_super_resolution_tpu.cli import _load_run

    trainer, state, step, cfg = _load_run(str(wd))
    ready = threading.Event()
    th = threading.Thread(
        target=serve,
        args=(trainer, state, cfg),
        kwargs=dict(port=0 or 8612, ready_event=ready),
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=60)

    with urllib.request.urlopen("http://127.0.0.1:8612/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert (health["model"], health["scale"]) == ("espcn", 2)

    rng = np.random.default_rng(0)
    img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(
        "http://127.0.0.1:8612/upscale", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        sr = np.asarray(Image.open(io.BytesIO(r.read())))
    assert sr.shape == (48, 64, 3)

    # concurrent same-shape requests ride the micro-batcher; each client
    # still gets *its own* upscaled image back
    imgs = [(rng.random((24, 32, 3)) * 255).astype(np.uint8) for _ in range(4)]
    outs: dict[int, np.ndarray] = {}

    def post(i):
        b = io.BytesIO()
        Image.fromarray(imgs[i]).save(b, format="PNG")
        rq = urllib.request.Request(
            "http://127.0.0.1:8612/upscale", data=b.getvalue(), method="POST"
        )
        with urllib.request.urlopen(rq, timeout=120) as resp:
            outs[i] = np.asarray(Image.open(io.BytesIO(resp.read())))

    ths = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=300)
    assert set(outs) == {0, 1, 2, 3}
    assert all(o.shape == (48, 64, 3) for o in outs.values())
    # distinct inputs -> distinct outputs (no result cross-wiring)
    assert not np.array_equal(outs[0], outs[1])
    with urllib.request.urlopen("http://127.0.0.1:8612/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["served"] >= 5
    assert health["batches"] >= 1

    # bad input -> clean 400
    req = urllib.request.Request(
        "http://127.0.0.1:8612/upscale", data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_bucket_respects_non_pow2_max_batch():
    from ml_super_resolution_tpu.serve import _bucket

    assert _bucket(5, 6) == 6  # not 8: the padded bucket never exceeds cap
    assert _bucket(3, 6) == 4
    assert _bucket(9, 8) == 8
    assert _bucket(1, 1) == 1


@pytest.mark.slow
def test_serve_multi_model_and_bf16(tmp_path, capsys):
    """Round-3 serving depth: bf16 trunk + second model behind ?model=."""
    wd1, wd2 = tmp_path / "a", tmp_path / "b"
    for wd, scale in ((wd1, "2"), (wd2, "3")):
        main([
            "train", "--model", "espcn", "--scale", scale,
            "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
            "--patch-size", "36", "--dp", "1",
            "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
        ])
    capsys.readouterr()

    from ml_super_resolution_tpu.cli import _load_run

    trainer, state, step, cfg = _load_run(str(wd1))
    tr2, st2, _, cfg2 = _load_run(str(wd2))
    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(trainer, state, cfg),
        kwargs=dict(port=8613, ready_event=ready, bf16=True,
                    extra_models={"x3": (tr2, st2, cfg2)}),
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=60)

    with urllib.request.urlopen("http://127.0.0.1:8613/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["bf16"] is True
    assert health["models"] == ["x3"]

    rng = np.random.default_rng(1)
    img = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    for q, want in (("", (48, 60, 3)), ("?model=x3", (72, 90, 3))):
        req = urllib.request.Request(
            f"http://127.0.0.1:8613/upscale{q}", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            sr = np.asarray(Image.open(io.BytesIO(r.read())))
        assert sr.shape == want, (q, sr.shape)

    # unknown model -> clean 404 listing the registry
    req = urllib.request.Request(
        "http://127.0.0.1:8613/upscale?model=nope", data=buf.getvalue(),
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised


def test_serve_y4m_streaming(tmp_path, capsys):
    """POST /upscale_y4m: stream a C420 clip up, byte-identical to the CLI
    file path (both run infer.upscale_y4m_stream)."""
    from ml_super_resolution_tpu.data.video import Y4MMeta, Y4MWriter

    wd = tmp_path / "run"
    main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()

    rng = np.random.default_rng(9)
    h, w = 16, 24
    clip = tmp_path / "clip.y4m"
    with Y4MWriter(clip, Y4MMeta(width=w, height=h, rate="24:1")) as wr:
        for _ in range(3):
            wr.write((rng.random((h, w)) * 255).astype(np.uint8),
                     (rng.random((h // 2, w // 2)) * 255).astype(np.uint8),
                     (rng.random((h // 2, w // 2)) * 255).astype(np.uint8))

    # reference: the CLI file path
    ref_out = tmp_path / "ref.y4m"
    main(["upscale", "--workdir", str(wd), "--input", str(clip),
          "--output", str(ref_out), "--batch", "2"])
    capsys.readouterr()

    from ml_super_resolution_tpu.cli import _load_run

    trainer, state, step, cfg = _load_run(str(wd))
    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(trainer, state, cfg),
        kwargs=dict(port=8621, ready_event=ready, max_batch=2), daemon=True)
    th.start()
    assert ready.wait(timeout=60)

    req = urllib.request.Request(
        "http://127.0.0.1:8621/upscale_y4m", data=clip.read_bytes(),
        method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        body = r.read()
    assert body == ref_out.read_bytes()

    # not a y4m stream -> clean 400, server stays healthy
    bad = urllib.request.Request(
        "http://127.0.0.1:8621/upscale_y4m", data=b"not a stream",
        method="POST")
    try:
        urllib.request.urlopen(bad, timeout=60)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    with urllib.request.urlopen("http://127.0.0.1:8621/healthz",
                                timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_serve_int8_trunk(tmp_path, capsys):
    """--int8 serving: first request calibrates, later requests (including a
    different shape) reuse the quantized forward; output close to f32."""
    wd = tmp_path / "run"
    main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "10",
    ])
    capsys.readouterr()
    from ml_super_resolution_tpu.cli import _load_run

    trainer, state, step, cfg = _load_run(str(wd))
    ready = threading.Event()
    th = threading.Thread(
        target=serve, args=(trainer, state, cfg),
        kwargs=dict(port=8623, ready_event=ready, int8=True), daemon=True)
    th.start()
    assert ready.wait(timeout=60)

    with urllib.request.urlopen("http://127.0.0.1:8623/healthz",
                                timeout=30) as r:
        assert json.loads(r.read())["int8"] is True

    rng = np.random.default_rng(2)

    def post(img):
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="PNG")
        rq = urllib.request.Request(
            "http://127.0.0.1:8623/upscale", data=b.getvalue(),
            method="POST")
        with urllib.request.urlopen(rq, timeout=120) as resp:
            return np.asarray(Image.open(io.BytesIO(resp.read())))

    img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    sr = post(img)
    assert sr.shape == (48, 64, 3)
    # second shape reuses the calibrated forward (no recalibration error)
    img2 = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    assert post(img2).shape == (32, 32, 3)

    # int8 output tracks the f32 path closely
    import jax.numpy as jnp

    from ml_super_resolution_tpu.infer import upscale_frames

    v = {"params": trainer.eval_params(state)}
    f32 = np.asarray(upscale_frames(
        trainer.model, v, jnp.asarray(img)[None], "espcn", 2))[0]
    err = np.abs(sr.astype(int) - f32.astype(int))
    assert np.percentile(err, 99) <= 8 and err.mean() < 2.0
