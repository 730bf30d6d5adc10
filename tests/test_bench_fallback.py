"""bench.py wedge guard: the headline must emit a parseable record even
when the device claim hangs (measured: the attach relay can wedge for
hours and the first device op then blocks forever).  The driver parses the
LAST stdout line — a hang would record nothing for the whole round.

Round-4 contract (bench.py:main): attempts run in a bounded subprocess and
return ``(record, reason)``; a TIMEOUT (wedge signature) retries only after
a >=600s quiet period gated by a cheap probe and only if the global budget
still affords a real measurement; a clean nonzero exit retries immediately
once; the headline JSON is re-emitted as the final stdout line on every
exit path.  The in-process _ChipLock is stubbed: it holds its fd until
process exit by design, so a second main() call in one pytest process
would otherwise spin on its own lock.
"""

import contextlib
import io
import json


GOOD = {"metric": "m", "value": 5000.0, "unit": "MP/s", "vs_baseline": 80.0}


def _run_main(monkeypatch, attempts, probe=True, total_budget=None):
    """Drive bench.main() with a scripted sequence of (record, reason)."""
    import bench

    seq = iter(attempts)
    budgets = []

    def fake_attempt(budget_s):
        budgets.append(budget_s)
        return next(seq)

    monkeypatch.setattr(bench, "_headline_attempt", fake_attempt)
    monkeypatch.setattr(bench, "_chip_probe", lambda s: probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_secondary_rows", lambda deadline: None)
    monkeypatch.setattr(bench, "_run_secondaries_subprocess",
                        lambda seconds: None)
    monkeypatch.setattr(bench._ChipLock, "acquire",
                        lambda self, deadline_s: True)
    if total_budget is not None:
        monkeypatch.setenv("SR_BENCH_TOTAL_BUDGET", str(total_budget))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    return [json.loads(l) for l in lines], budgets


def test_provisional_record_is_first_line(monkeypatch):
    """Line 1 is a parseable zero record: an external kill at ANY later
    point still leaves valid JSON at the stdout tail."""
    recs, _ = _run_main(monkeypatch, [(GOOD, "ok")])
    assert recs[0]["value"] == 0.0 and "provisional" in recs[0]["error"]
    assert recs[0]["unit"] == "MP/s"


def test_headline_first_try_no_retry(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [(GOOD, "ok")])
    assert budgets == [900]
    assert recs[1] == GOOD and recs[-1] == GOOD


def test_headline_double_timeout_emits_zero_record(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [(None, "timeout"),
                                            (None, "timeout")])
    assert len(budgets) == 2  # exactly one probe-gated retry
    rec = recs[-1]
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "timeout then timeout" in rec["error"]


def test_headline_timeout_retry_recovers(monkeypatch):
    recs, budgets = _run_main(monkeypatch, [(None, "timeout"), (GOOD, "ok")])
    assert len(budgets) == 2
    assert recs[1] == GOOD and recs[-1] == GOOD


def test_headline_rc_failure_retries_immediately(monkeypatch):
    """A clean nonzero child exit is NOT a wedge: one immediate retry."""
    recs, budgets = _run_main(monkeypatch, [(None, "rc=3"), (GOOD, "ok")])
    assert len(budgets) == 2
    assert recs[-1] == GOOD


def test_headline_timeout_probe_dead_no_second_kill(monkeypatch):
    """If the post-quiet probe can't reach the chip, bench must NOT spawn
    (and then SIGKILL) another attached child — zero record, 1 attempt."""
    recs, budgets = _run_main(monkeypatch, [(None, "timeout")], probe=False)
    assert len(budgets) == 1
    assert recs[-1]["value"] == 0.0
    assert "probe" in recs[-1]["error"]


def test_headline_timeout_without_budget_skips_retry(monkeypatch):
    """A retry needs quiet(600) + probe(300) + measurement(420) of budget;
    with less left, retrying would keep the relay wedged — zero record."""
    recs, budgets = _run_main(monkeypatch, [(None, "timeout")],
                              total_budget=700)
    assert len(budgets) == 1
    assert recs[-1]["value"] == 0.0


def test_headline_attempt_parses_child_tail(monkeypatch):
    """_headline_attempt returns the LAST bench JSON line of the child's
    stdout, scanning past malformed lines, and classifies failures."""
    import subprocess
    import types

    import bench

    def fake_run(argv, stdout=None, timeout=None):
        out = (b'{"oops": malformed\n'
               b'{"metric": "m", "value": 1.0, "unit": "MP/s", "vs_baseline": 0.1}\n'
               b'# trailing comment\n')
        return types.SimpleNamespace(returncode=0, stdout=out)

    monkeypatch.setattr(subprocess, "run", fake_run)
    rec, reason = bench._headline_attempt(5)
    assert reason == "ok" and rec["value"] == 1.0

    def bad_run(argv, stdout=None, timeout=None):
        return types.SimpleNamespace(returncode=0, stdout=b"no json here\n")

    monkeypatch.setattr(subprocess, "run", bad_run)
    assert bench._headline_attempt(5) == (None, "unparseable")

    def rc_run(argv, stdout=None, timeout=None):
        return types.SimpleNamespace(returncode=3, stdout=b"{}")

    monkeypatch.setattr(subprocess, "run", rc_run)
    assert bench._headline_attempt(5) == (None, "rc=3")

    def timeout_run(argv, stdout=None, timeout=None):
        raise subprocess.TimeoutExpired(argv, timeout)

    monkeypatch.setattr(subprocess, "run", timeout_run)
    assert bench._headline_attempt(5) == (None, "timeout")


def test_secondaries_run_in_subprocess(monkeypatch, capsys):
    """The parent never attaches: secondary rows go through a bounded child
    (round-4 preview lesson: one wedged in-parent attach hung every later
    row).  rc=86 = attach-wedge bail, reported but not fatal."""
    import subprocess
    import types

    import bench

    calls = []

    def fake_popen(argv, stdout=None, stderr=None):
        calls.append(argv)
        assert "--secondary-only" in argv
        return types.SimpleNamespace(wait=lambda timeout=None: 86)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    bench._run_secondaries_subprocess(seconds=300)
    assert len(calls) == 1 and float(calls[0][-1]) <= 270
    err = capsys.readouterr().err
    assert "attach-wedge signature" in err

    # under 60s of budget: no child at all
    bench._run_secondaries_subprocess(seconds=45)
    assert len(calls) == 1
    assert "no budget for secondary rows" in capsys.readouterr().err


def test_secondaries_child_overrun_is_terminated(monkeypatch, capsys):
    import subprocess
    import types

    import bench

    state = {"terminated": False, "killed": False}

    class FakeProc:
        def wait(self, timeout=None):
            if not state["terminated"]:
                raise subprocess.TimeoutExpired("bench", timeout)
            return -15

        def terminate(self):
            state["terminated"] = True

        def kill(self):
            state["killed"] = True

    monkeypatch.setattr(subprocess, "Popen",
                        lambda argv, stdout=None, stderr=None: FakeProc())
    bench._run_secondaries_subprocess(seconds=120)
    assert state["terminated"] and not state["killed"]
    assert "overran its budget" in capsys.readouterr().err
