"""bench.py wedge guard: the headline must emit a parseable record even
when the device claim hangs (measured: the attach relay can wedge for
hours and the first device op then blocks forever).  The driver parses the
LAST stdout line — a hang would record nothing for the whole round.

Round-3 hardening: the headline runs in a bounded subprocess and gets ONE
quiet-period retry before the zero record, so a transient wedge at bench
time no longer zeroes the round.
"""

import contextlib
import io
import json


def _run_main(monkeypatch, attempts):
    """Drive bench.main() with a scripted sequence of attempt outcomes."""
    import bench

    seq = iter(attempts)
    budgets = []

    def fake_attempt(budget_s):
        budgets.append(budget_s)
        return next(seq)

    monkeypatch.setattr(bench, "_headline_attempt", fake_attempt)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_secondary_rows", lambda: None)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    return [json.loads(l) for l in lines], budgets


GOOD = {"metric": "m", "value": 5000.0, "unit": "MP/s", "vs_baseline": 80.0}


def test_provisional_record_is_first_line(monkeypatch):
    """Line 1 is a parseable zero record: an external kill at ANY later
    point still leaves valid JSON at the stdout tail."""
    recs, _ = _run_main(monkeypatch, [GOOD])
    assert recs[0]["value"] == 0.0 and "provisional" in recs[0]["error"]
    assert recs[0]["unit"] == "MP/s"


def test_headline_double_timeout_emits_zero_record(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [None, None])
    assert len(budgets) == 2  # exactly one retry
    rec = recs[-1]
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "error" in rec and rec["unit"] == "MP/s"


def test_headline_retry_recovers(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [None, GOOD])
    assert len(budgets) == 2
    # measured headline supersedes the provisional record and is the tail
    assert recs[1] == GOOD and recs[-1] == GOOD


def test_headline_first_try_no_retry(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [GOOD])
    assert budgets == [900]
    assert recs[1] == GOOD and recs[-1] == GOOD


def test_headline_attempt_parses_child_tail(monkeypatch):
    """_headline_attempt returns the LAST JSON line of the child's stdout
    and rejects malformed / non-bench records."""
    import types

    import bench

    def fake_run(argv, stdout=None, timeout=None):
        out = b'# comment\n{"metric": "m", "value": 1.0, "unit": "MP/s", "vs_baseline": 0.1}\n'
        return types.SimpleNamespace(returncode=0, stdout=out)

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    rec = bench._headline_attempt(5)
    assert rec is not None and rec["value"] == 1.0

    def bad_run(argv, stdout=None, timeout=None):
        return types.SimpleNamespace(returncode=0, stdout=b"no json here\n")

    monkeypatch.setattr(subprocess, "run", bad_run)
    assert bench._headline_attempt(5) is None

    def rc_run(argv, stdout=None, timeout=None):
        return types.SimpleNamespace(returncode=3, stdout=b"{}")

    monkeypatch.setattr(subprocess, "run", rc_run)
    assert bench._headline_attempt(5) is None

    def timeout_run(argv, stdout=None, timeout=None):
        raise subprocess.TimeoutExpired(argv, timeout)

    monkeypatch.setattr(subprocess, "run", timeout_run)
    assert bench._headline_attempt(5) is None
