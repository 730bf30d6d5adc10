"""Production-style serving loop: HTTP upscaling endpoint with micro-batching.

``sr serve --workdir runs/x --port 8600`` exposes

    POST /upscale   body: PNG/JPEG bytes -> body: PNG bytes (upscaled)
    GET  /healthz   -> {"status": "ok", "model": ..., "scale": ..., stats}

Design notes (TPU serving shape):
* the model/variables are loaded once; jax caches the compiled program per
  input shape, so steady-state traffic with common sizes pays dispatch only;
* **micro-batching**: one device-worker thread drains a request queue,
  coalescing same-shape requests that arrive within ``window_ms`` (default
  4 ms) up to ``max_batch`` into a single batched forward — concurrent
  clients share one XLA dispatch instead of serializing N of them.  The
  batch dimension is padded to a small set of bucket sizes (1/2/4/8) so at
  most 4 programs compile per image shape;
* PNG decode (native C++ path when possible) and encode run on the request
  threads, so the device worker does device work only;
* stdlib ``http.server`` with a threaded server — no extra dependencies.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["serve"]


class _BoundedReader:
    """File-like view over the first ``n`` bytes of ``f`` — lets the Y4M
    parser stream an HTTP request body without reading past Content-Length
    (which would block on the open socket)."""

    def __init__(self, f, n: int):
        self._f, self._n = f, n

    def read(self, k: int) -> bytes:
        k = min(k, self._n)
        if k <= 0:
            return b""
        buf = self._f.read(k)
        self._n -= len(buf)
        return buf

    def readline(self, limit: int = 4096) -> bytes:
        line = self._f.readline(min(limit, self._n)) if self._n > 0 else b""
        self._n -= len(line)
        return line


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n and b < max_batch:
        b *= 2
    # a non-power-of-two max_batch must still cap the padded bucket
    return min(b, max_batch)


class _Batcher:
    """Coalesces same-shape requests into one batched device call."""

    def __init__(self, fn, max_batch: int = 8, window_ms: float = 4.0):
        self._fn = fn  # (N, h, w, 3) uint8 -> (N, H, W, 3) uint8 numpy
        self._q: queue.Queue = queue.Queue()
        self._pending: deque = deque()  # items deferred by a shape mismatch
        self.max_batch = max(1, max_batch)
        self.window = window_ms / 1000.0
        self.served = 0
        self.batches = 0
        threading.Thread(target=self._run, daemon=True).start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        ev = threading.Event()
        slot: dict = {}
        self._q.put((img, ev, slot))
        ev.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def _next_item(self, timeout):
        if self._pending:
            return self._pending.popleft()
        return self._q.get(timeout=timeout)

    def _run(self):
        while True:
            try:
                first = self._next_item(timeout=None)
            except Exception:
                continue
            batch = [first]
            shape = first[0].shape
            deadline = time.monotonic() + self.window
            stash = []
            while len(batch) < self.max_batch:
                t = deadline - time.monotonic()
                if t <= 0 and not self._pending:
                    break
                try:
                    item = self._next_item(timeout=max(t, 0.0))
                except queue.Empty:
                    break
                if item[0].shape == shape:
                    batch.append(item)
                else:
                    stash.append(item)  # different shape: next batch
            self._pending.extend(stash)
            try:
                self._process(batch)
            except Exception as e:
                # A failure anywhere in _process (even outside the device
                # call, e.g. MemoryError in np.stack) must not kill the
                # worker thread: waiters would block forever on ev.wait().
                for _, ev, slot in batch:
                    slot["err"] = e
                    ev.set()

    def _process(self, batch):
        imgs = np.stack([b[0] for b in batch])
        n = len(batch)
        nb = _bucket(n, self.max_batch)
        if nb != n:  # pad to the bucket so shapes (and programs) stay few
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], nb - n, axis=0)])
        try:
            out = self._fn(imgs)
            for i, (_, ev, slot) in enumerate(batch):
                slot["out"] = np.asarray(out[i])
                ev.set()
            self.served += n
            self.batches += 1
        except Exception as e:  # propagate to every waiter, keep serving
            for _, ev, slot in batch:
                slot["err"] = e
                ev.set()


def serve(trainer, state, cfg, host: str = "127.0.0.1", port: int = 8600,
          use_pallas: bool = False, ready_event=None,
          max_batch: int = 8, window_ms: float = 4.0, bf16: bool = False,
          extra_models: dict | None = None, artifact: str | None = None,
          int8: bool = False):
    """Blocking serve loop; ``ready_event`` (threading.Event) set when bound.

    ``bf16`` swaps the serving trunk to bfloat16 compute (params stay f32 on
    device; flax casts per-op) — the fastest measured configuration at
    quality parity.  ``extra_models`` maps additional endpoint names to
    ``(trainer, state, cfg)`` triples; requests pick one via
    ``POST /upscale?model=<name>`` (default: the primary model).

    ``artifact`` serves an AOT-exported SRX1 file (aot.py) INSTEAD of a
    checkpoint: ``trainer``/``state``/``cfg`` may all be None — the serving
    host needs no model code.  Requests must match the exported LR frame
    geometry; the micro-batcher buckets over the exported batch sizes.

    ``int8`` serves the PTQ-quantized conv stack (quant.py): the first
    request batch calibrates the activation scales (one eager pass), every
    later request reuses the quantized forward — the int8-MXU serving path.
    """
    from PIL import Image

    from ml_super_resolution_tpu.infer import upscale_frames

    stream_ctx: dict = {}  # primary model handles for POST /upscale_y4m

    def make_device_fn(trainer, state, cfg, primary: bool = False):
        import jax.numpy as jnp

        model = trainer.model
        if bf16:
            import dataclasses

            from ml_super_resolution_tpu.models import build_model

            ov = dict(cfg.model.overrides)
            ov["dtype"] = jnp.bfloat16
            model = build_model(dataclasses.replace(cfg.model, overrides=ov))
        variables = {"params": trainer.eval_params(state)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        model_name, scale = cfg.model.name, cfg.model.scale
        if primary:
            stream_ctx.update(model=model, variables=variables,
                              name=model_name, scale=scale)
        qfn_cache: dict = {}

        def device_fn(imgs: np.ndarray) -> np.ndarray:
            prebuilt = None
            if int8:
                # calibrate once, on the first request batch; the quantized
                # forward is shape-generic so every later shape reuses it
                if "fn" not in qfn_cache:
                    from ml_super_resolution_tpu.infer import (
                        make_int8_apply_fn,
                    )

                    qfn_cache["fn"] = make_int8_apply_fn(
                        model, variables, model_name, scale, imgs[:1])
                prebuilt = qfn_cache["fn"]
            return np.asarray(upscale_frames(
                model, variables, jnp.asarray(imgs), model_name, scale,
                use_pallas=use_pallas, prebuilt_apply_fn=prebuilt,
            ))

        return device_fn

    def _artifact_max_batch(header, path, cap: int) -> int:
        """Micro-batch cap for an artifact: symbolic-batch artifacts serve
        any size (keep the user's cap); fixed-bucket ones clamp to the
        largest exported power-of-two prefix within the user's cap, so
        every bucket ``_bucket`` can produce has a program and a user
        --max-batch (a host memory bound) is never raised."""
        if header["batches"] == "any":
            return cap
        avail = set(header["batches"])
        if 1 not in avail:
            raise ValueError(f"{path}: batch 1 not exported "
                             f"(batches={sorted(avail)})")
        b = 1
        while b * 2 in avail:
            b *= 2
        cap = min(cap, b)
        m = 1
        while m * 2 <= cap:
            m *= 2
        return m

    user_max_batch = max_batch
    art_state: dict = {}  # current artifact path + header (for /reload)
    if artifact:
        from ml_super_resolution_tpu.aot import load_artifact

        header, afn = load_artifact(artifact)
        model_name, scale = header["model"], header["scale"]
        max_batch = _artifact_max_batch(header, artifact, user_max_batch)
        art_state.update(path=str(artifact), header=header)
        batchers = {"": _Batcher(afn, max_batch=max_batch,
                                 window_ms=window_ms)}
    else:
        model_name, scale = cfg.model.name, cfg.model.scale
        batchers = {"": _Batcher(make_device_fn(trainer, state, cfg,
                                                primary=True),
                                 max_batch=max_batch, window_ms=window_ms)}
        for name, (tr_i, st_i, cfg_i) in (extra_models or {}).items():
            batchers[name] = _Batcher(make_device_fn(tr_i, st_i, cfg_i),
                                      max_batch=max_batch,
                                      window_ms=window_ms)
    batcher = batchers[""]

    def decode(body: bytes) -> np.ndarray:
        try:
            from ml_super_resolution_tpu.data import native

            if native.available():
                return native.decode_png(body)
        except Exception:
            pass
        return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                hdr = art_state.get("header")
                self._json(200, {
                    "status": "ok",
                    "model": hdr["model"] if hdr else model_name,
                    "scale": hdr["scale"] if hdr else scale,
                    "bf16": bf16, "int8": int8,
                    "artifact": art_state.get("path", ""),
                    "models": [n for n in batchers if n] or [model_name],
                    "served": batcher.served, "batches": batcher.batches,
                    "mean_batch": round(
                        batcher.served / max(1, batcher.batches), 2
                    ),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/upscale_y4m":
                self._y4m_stream()
                return
            if url.path == "/reload":
                self._reload(parse_qs(url.query).get("path", [""])[0])
                return
            if url.path != "/upscale":
                self._json(404, {"error": "not found"})
                return
            want = parse_qs(url.query).get("model", [""])[0]
            b = batchers.get(want)
            if b is None:
                self._json(404, {"error": f"unknown model {want!r}",
                                 "models": [n for n in batchers if n]})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                img = decode(self.rfile.read(length))
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            try:
                sr = b.submit(img)
            except Exception as e:
                self._json(500, {"error": f"device: {e}"})
                return
            buf = io.BytesIO()
            Image.fromarray(sr).save(buf, format="PNG")
            out = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def _reload(self, path: str):
            """Zero-downtime artifact swap: ``POST /reload?path=new.srx``
            (default: re-read the current file) loads + validates the new
            SRX1 artifact, then atomically swaps the batcher's device fn —
            the worker thread reads it once per batch, so in-flight
            requests finish on the old program and the next batch runs the
            new one.  Geometry may change; old-geometry requests then get
            per-request 500s, the server keeps serving."""
            if not art_state:
                self._json(400, {"error": "reload needs --from-export mode"})
                return
            target = path or art_state["path"]
            try:
                from ml_super_resolution_tpu.aot import load_artifact

                hdr2, afn2 = load_artifact(target)
                mb = _artifact_max_batch(hdr2, target, user_max_batch)
            except Exception as e:
                self._json(400, {"error": f"reload failed: {e}"})
                return
            b = batchers[""]
            b._fn = afn2
            b.max_batch = mb
            art_state.update(path=str(target), header=hdr2)
            self._json(200, {"reloaded": str(target), **hdr2})

        def _y4m_stream(self):
            """POST a Y4M container, stream back the upscaled Y4M: frames
            are read, upscaled in batches and written as they complete —
            the response begins before the request finishes processing
            (HTTP/1.0 close-delimited body; errors after the 200 status has
            been sent surface as a truncated stream).  Runs the shared
            pipeline ``infer.upscale_y4m_stream`` directly on the request
            thread; PNG micro-batching traffic is unaffected."""
            from ml_super_resolution_tpu.data.video import Y4MReader, Y4MWriter
            from ml_super_resolution_tpu.infer import upscale_y4m_stream

            if not stream_ctx:
                self._json(400, {"error": "y4m streaming needs a checkpoint-"
                                          "backed server (not --from-export)"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            if length <= 0:
                self._json(411, {"error": "Content-Length required"})
                return
            try:
                rd = Y4MReader(_BoundedReader(self.rfile, length))
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "video/x-yuv4mpeg2")
            self.end_headers()
            upscale_y4m_stream(
                rd, lambda m: Y4MWriter(self.wfile, m),
                stream_ctx["model"], stream_ctx["variables"],
                stream_ctx["name"], stream_ctx["scale"], batch=max_batch,
                use_pallas=use_pallas, int8=int8)

    httpd = ThreadingHTTPServer((host, port), Handler)
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    return httpd
