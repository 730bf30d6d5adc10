"""bench.py wedge guard: the headline must emit a parseable record even
when the device claim hangs (measured: the attach relay can wedge for
hours and the first device op then blocks forever).  The driver parses the
LAST stdout line — a hang would record nothing for the whole round."""

import contextlib
import io
import json
import time


def test_headline_timeout_emits_zero_record(monkeypatch):
    import bench

    def hang(*a, **k):
        time.sleep(5)
        raise AssertionError("unreachable")

    monkeypatch.setattr(bench, "bench_model_mps", hang)

    real = bench._bounded

    class fast(real):
        def __init__(self, seconds, label, swallow=True):
            super().__init__(1, label, swallow)

    monkeypatch.setattr(bench, "_bounded", fast)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "error" in rec and "MP/s" == rec["unit"]
