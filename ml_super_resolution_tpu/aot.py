"""AOT-exported serving artifacts (``jax.export``) — the deployment leg of
the serving stack (SURVEY §3.3, modernized).

``sr export`` packages a trained run's ENTIRE inference pipeline — uint8 RGB
frames in, uint8 HR RGB frames out, including YCbCr split, bicubic chroma,
the (optionally int8-quantized / bf16) conv stack and the merge — as one
self-describing file of serialized StableHLO programs.  ``sr serve
--from-export file.srx`` then serves it with the micro-batching worker and
NO model code, checkpoint, or flax dependency on the serving host: the
artifact is the deployable unit, the training repo is not.

Format ``SRX1`` (little-endian):

    b"SRX1" | u32 header_len | header JSON (utf-8) | blob_0 | blob_1 | ...

The header records the model name/scale, frame geometry, the exported batch
sizes (one program per micro-batch bucket: 1/2/4/.../max), quantization
mode, creation step and jax version; ``blob_sizes`` gives each program's
byte length in ``batches`` order.

Programs are lowered for BOTH cpu and tpu (``jax.export`` multi-platform
lowering), so one artifact serves on a TPU host and replays bit-stably in a
CPU CI.  The platform safety check stays enabled by default; the remote
v5e attach path registers the standard tpu PJRT platform underneath, so
checks pass there too.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

__all__ = ["MAGIC", "export_artifact", "load_artifact"]

MAGIC = b"SRX1"


def _pipeline(model, variables, model_name: str, scale: int,
              int8_calib_u8=None):
    """The full uint8->uint8 serving pipeline as one traceable callable.

    int8 calibration (eager readbacks) runs HERE, outside the trace; the
    resulting quantized forward rides into ``upscale_frames`` as
    ``prebuilt_apply_fn``.
    """
    from ml_super_resolution_tpu.infer import (
        make_int8_apply_fn,
        upscale_frames,
    )

    apply_fn = None
    if int8_calib_u8 is not None:
        apply_fn = make_int8_apply_fn(model, variables, model_name, scale,
                                      int8_calib_u8)

    def pipeline(frames_u8):
        return upscale_frames(model, variables, frames_u8, model_name, scale,
                              prebuilt_apply_fn=apply_fn)

    return pipeline


def export_artifact(model, variables, model_name: str, scale: int,
                    height: int, width: int, out_path,
                    batches=(1, 2, 4, 8), int8: bool = False,
                    calib_u8=None, step: int = 0,
                    platforms=("cpu", "tpu")) -> dict:
    """Serialize the serving pipeline for LR frames of ``(height, width)``
    at each micro-batch bucket in ``batches``.  Returns the header dict.

    ``int8`` quantizes the conv stack (quant.py) calibrated on ``calib_u8``
    (an ``(N, height, width, 3)`` uint8 batch; required when int8).

    ``batches="any"`` exports ONE shape-polymorphic program (symbolic batch
    dim via ``jax.export.symbolic_shape``) instead of per-bucket blobs: the
    artifact serves every batch size, specializing per concrete shape at
    call time on the target (TPU compile-cache amortizes this).
    """
    import jax
    from jax import export as jexport

    if int8 and calib_u8 is None:
        raise ValueError("int8 export needs calib_u8 (a representative "
                         "uint8 LR frame batch)")
    symbolic = isinstance(batches, str)
    if symbolic and batches != "any":
        raise ValueError(f"batches must be ints or 'any', got {batches!r}")
    fn = _pipeline(model, variables, model_name, scale,
                   int8_calib_u8=calib_u8 if int8 else None)
    jfn = jax.jit(fn)
    if symbolic:
        batches = "any"
        (bdim,) = jexport.symbolic_shape("b")
        specs = [jax.ShapeDtypeStruct((bdim, height, width, 3),
                                      jax.numpy.uint8)]
    else:
        batches = sorted(set(int(b) for b in batches))
        specs = [jax.ShapeDtypeStruct((b, height, width, 3), jax.numpy.uint8)
                 for b in batches]
    blobs = [jexport.export(jfn, platforms=tuple(platforms))(s).serialize()
             for s in specs]
    header = {
        "format": "SRX1",
        "model": model_name,
        "scale": scale,
        "height": height,
        "width": width,
        "batches": batches,
        "blob_sizes": [len(b) for b in blobs],
        "int8": bool(int8),
        "step": int(step),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    hjson = json.dumps(header).encode()
    out_path = Path(out_path)
    with open(out_path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
    return header


def load_artifact(path):
    """Load an SRX1 artifact: ``(header, fn)`` where ``fn`` maps an
    ``(N, height, width, 3)`` uint8 batch (N must be one of
    ``header["batches"]``) to the HR uint8 batch."""
    from jax import export as jexport

    raw = Path(path).read_bytes()
    if raw[:4] != MAGIC:
        raise ValueError(f"{path}: not an SRX1 artifact")
    (hlen,) = struct.unpack("<I", raw[4:8])
    header = json.loads(raw[8:8 + hlen].decode())
    offset = 8 + hlen
    symbolic = header["batches"] == "any"
    keys = ["any"] if symbolic else header["batches"]
    calls = {}
    for b, size in zip(keys, header["blob_sizes"]):
        calls[b] = jexport.deserialize(raw[offset:offset + size]).call
        offset += size

    def fn(frames_u8: np.ndarray) -> np.ndarray:
        n, h, w, c = frames_u8.shape
        if (h, w, c) != (header["height"], header["width"], 3):
            raise ValueError(
                f"artifact serves {header['height']}x{header['width']}x3 "
                f"LR frames, got {h}x{w}x{c}")
        call = calls["any"] if symbolic else calls.get(n)
        if call is None:
            raise ValueError(
                f"batch {n} not exported; available: {header['batches']}")
        return np.asarray(call(frames_u8))

    return header, fn
