"""Minimal production-style serving loop: HTTP upscaling endpoint.

``sr serve --workdir runs/x --port 8600`` exposes

    POST /upscale   body: PNG/JPEG bytes -> body: PNG bytes (upscaled)
    GET  /healthz   -> {"status": "ok", "model": ..., "scale": ...}

Design notes (TPU serving shape):
* the model/variables are loaded once; each request is one jitted forward —
  jax caches the compiled program per input shape, so steady-state traffic
  with common sizes pays dispatch only;
* decode uses the native C++ PNG path when possible (data/native.py);
* stdlib ``http.server`` with a threaded server — device work is serialized
  through a lock (one TPU program at a time is optimal here anyway).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["serve"]


def serve(trainer, state, cfg, host: str = "127.0.0.1", port: int = 8600,
          use_pallas: bool = False, ready_event=None):
    """Blocking serve loop; ``ready_event`` (threading.Event) set when bound."""
    from PIL import Image

    from ml_super_resolution_tpu.infer import upscale_frames

    variables = {"params": trainer.eval_params(state)}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    model_name, scale = cfg.model.name, cfg.model.scale
    device_lock = threading.Lock()

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
                self._json(200, {"status": "ok", "model": model_name, "scale": scale})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/upscale":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                img = decode(self.rfile.read(length))
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            import jax.numpy as jnp

            with device_lock:
                sr = np.asarray(
                    upscale_frames(
                        trainer.model, variables, jnp.asarray(img)[None],
                        model_name, scale, use_pallas=use_pallas,
                    )[0]
                )
            buf = io.BytesIO()
            Image.fromarray(sr).save(buf, format="PNG")
            out = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    httpd = ThreadingHTTPServer((host, port), Handler)
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    return httpd
