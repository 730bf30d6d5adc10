"""Benchmark harness: upscaled megapixels/sec/chip at x4 (BASELINE.json:2).

Stdout contract: MULTIPLE JSON lines may appear; the LAST one is
authoritative.  The first is a provisional zero record (so an outer
SIGKILL mid-measurement still leaves a parseable tail); every later
emission supersedes it, and the headline record is re-printed as the
final stdout line after the secondary rows (or on any early exit).

Headline: ESPCN x4 batched video-frame SR producing 1080p output — the
configuration with a published hardware anchor (arXiv:1609.05158 claims
real-time >30 fps 1080p on a K2 GPU, i.e. ~62.2 output MP/s; the reference
repo itself publishes no numbers, BASELINE.json:13).  ``vs_baseline`` is
measured MP/s over that 62.2 MP/s anchor; the driver's north-star target is
>=5x the reference's throughput (BASELINE.json:5), so vs_baseline >= 5 is
the bar.  Secondary rows (folded-tail, fused-VDSR, int8, XLA zoo, serving)
go to stderr, value-first under a global deadline (SR_BENCH_TOTAL_BUDGET,
default 1380 s) so an outer supervisor timeout can't cut the best rows.

Chip-claim discipline: this process participates in the repo-wide chip
mutex (tools/chiplock.sh) by taking the same flock on SR_CHIP_LOCK from
Python before any device use, and holds it until exit (with the measured
45 s teardown gap).  Do NOT wrap ``python bench.py`` in ``with_chip`` —
that would deadlock on the self-acquired lock; run it bare.

Timing protocol (tunnel-safe): on this environment the device is reached
through a relay where ``block_until_ready`` does not fence and every host
readback costs ~30 ms, so wall-clocking individual dispatches measures the
relay, not the chip.  Instead N iterations run inside ONE compiled
``lax.fori_loop`` program whose loop-carried accumulator consumes every
iteration's output (defeats CSE/hoisting); per-iteration time is the
difference quotient between an N-run and a 2N-run, which cancels dispatch +
readback latency exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _iter_time(apply_fn, variables, x, iters: int = 20, repeats: int = 3):
    """Seconds per application of apply_fn, latency-cancelled (see module doc)."""
    import jax
    import jax.numpy as jnp

    def make_loop(n):
        @jax.jit
        def loop(v, inp):
            def body(i, acc):
                # i-dependent input perturbation: prevents loop-invariant
                # code motion from hoisting the model call (cost: one VPU
                # add).  Cast to the input dtype: a bare f32 scalar would
                # promote bf16 inputs to f32 and change what's measured
                # (observed: dtype-mismatch failures in raw-conv bf16 rows).
                eps = (jnp.float32(1e-30) * i).astype(inp.dtype)
                out = apply_fn(v, inp + eps)
                return acc + jnp.float32(jnp.mean(out))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop

    run_n, run_2n = make_loop(iters), make_loop(2 * iters)
    float(run_n(variables, x))  # compile both
    float(run_2n(variables, x))

    def timed(fn):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(variables, x))  # scalar readback = completion fence
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(run_2n) - timed(run_n)) / iters


def bench_model_mps(name: str, scale: int, out_hw, batch: int, channels: int,
                    overrides=None, iters: int = 20):
    """Output megapixels/sec for a model producing ``out_hw`` frames."""
    import jax
    import jax.numpy as jnp

    from ml_super_resolution_tpu.models import MODEL_SPECS, build_model
    from ml_super_resolution_tpu.utils.config import ModelConfig

    spec = MODEL_SPECS[name]
    oh, ow = out_hw
    in_h, in_w = (oh // scale, ow // scale) if spec["lr_space"] else (oh, ow)
    ov = dict(overrides or {})
    cfg = ModelConfig(name=name, scale=scale, channels=channels, overrides=ov)
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, in_h, in_w, channels)),
        dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(0), x[:1], train=False)

    def fwd(v, inp):
        return model.apply(v, inp, train=False)

    dt = _iter_time(fwd, variables, x, iters=iters)
    mp = batch * oh * ow / 1e6
    return mp / dt, dt


_HEADLINE_METRIC = "upscaled megapixels/sec/chip at x4 (ESPCN, 1080p video SR)"
_WEDGE_QUIET_S = 600   # post-timeout quiet period (CLAUDE.md: a timed-out
                       # attempt SIGKILLs an attached child — a wedge-class
                       # insult; recovery gates must be patient, >=600 s)
_CLAIM_GAP_S = 45      # teardown gap before the next process attaches
_LOCK_PATH = os.environ.get("SR_CHIP_LOCK", "/tmp/sr_chip.lock")
# Secondary-row coverage handoff: the child writes completed/skipped labels
# here; the parent folds them into the final headline JSON (next #6).
_ROWS_STATUS_PATH = os.environ.get("SR_BENCH_ROWS_STATUS",
                                   "/tmp/sr_bench_rows.json")


class _ChipLock:
    """The same whole-file flock tools/chiplock.sh::with_chip takes (fd 9 on
    SR_CHIP_LOCK), acquired from Python so bench participates in the repo's
    chip mutual exclusion (CLAUDE.md hazard 2).  Held until process exit;
    callers sleep the teardown gap before releasing."""

    def __init__(self):
        self.fd = None

    def acquire(self, deadline_s: float) -> bool:
        import fcntl

        if self.fd is None:
            self.fd = os.open(_LOCK_PATH, os.O_WRONLY | os.O_CREAT, 0o666)
        t0 = time.monotonic()
        while True:
            try:
                fcntl.flock(self.fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return True
            except OSError:
                if time.monotonic() - t0 >= deadline_s:
                    return False
                time.sleep(5)


def _headline_attempt(budget_s: int):
    """Run the headline measurement in a BOUNDED SUBPROCESS.

    Why a subprocess: a wedged attach relay hangs the first device op
    forever (measured 2026-08-17: >9 h).  An in-process SIGALRM can unwind
    the Python frame, but the process keeps a half-attached device client —
    any later device use (secondary rows, a retry) just hangs again.  A
    killed child leaves THIS process clean.  Returns ``(record, reason)``:
    record is the parsed result dict or None; reason is "ok", "timeout"
    (wedge signature — the child was SIGKILLed while attached) or
    "rc=N" / "unparseable" (deterministic failure, NOT a wedge).
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            stdout=subprocess.PIPE, timeout=budget_s,
        )
    except subprocess.TimeoutExpired:
        print(f"# headline attempt timed out after {budget_s}s "
              f"(relay wedge signature)", file=sys.stderr)
        return None, "timeout"
    if proc.returncode != 0:
        print(f"# headline attempt exited rc={proc.returncode}",
              file=sys.stderr)
        return None, f"rc={proc.returncode}"
    for line in reversed(proc.stdout.decode(errors="replace").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # keep scanning earlier lines
            if rec.get("unit") == "MP/s":
                return rec, "ok"
    return None, "unparseable"


def _chip_probe(budget_s: int) -> bool:
    """Cheap bounded tiny-op probe (chip_health pattern): can a subprocess
    attach and sum an (8,128) on the device within ``budget_s``?"""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "print('probe ok', float(jnp.sum(jnp.ones((8,128)))))")
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=budget_s,
                              stdout=subprocess.DEVNULL)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _measure_headline():
    """In-process headline measurement; returns the result record.

    Batch 32 = ~1 s of 30 fps video per dispatch: measured +25% over the
    round-2 b8 config (4,727 -> 5,893 MP/s; runs/espcn_batch_probe.log),
    still ~11 ms latency per 32-frame batch.  bf16 trunk: the fastest
    measured configuration, at verified quality parity (RESULTS.md
    "bf16 trunk training/inference parity").
    """
    import jax.numpy as jnp

    anchor = 1920 * 1080 * 30 / 1e6  # ESPCN paper: 30 fps 1080p on K2
    # Debug knob for chipless hosts: SR_BENCH_GEOM="HxW:B" shrinks the
    # measured geometry so the full parent->child->parse path can be driven
    # on CPU in seconds.  The recorded number is only meaningful at the
    # default geometry on the real chip; vs_baseline still uses the 1080p
    # anchor, so a shrunken run is self-evidently not a headline number.
    geom = os.environ.get("SR_BENCH_GEOM", "1080x1920:32")
    hw, _, b = geom.partition(":")
    h, _, w = hw.partition("x")
    oh, ow, batch = int(h), int(w), int(b or 32)
    mps, dt = bench_model_mps("espcn", 4, (oh, ow), batch=batch,
                              channels=1, overrides={"dtype": jnp.bfloat16})
    print(
        f"# espcn-bf16 x4 -> {oh}p: {mps:.1f} MP/s ({dt*1e3:.2f} ms / {batch}-frame batch)",
        file=sys.stderr,
    )
    return {
        "metric": _HEADLINE_METRIC,
        "value": round(mps, 1),
        "unit": "MP/s",
        "vs_baseline": round(mps / anchor, 2),
    }


def _zero_record(error: str):
    return {"metric": _HEADLINE_METRIC, "value": 0.0, "unit": "MP/s",
            "vs_baseline": 0.0, "error": error}


def main():
    # Global wall-clock budget: the driver runs `python bench.py` under an
    # outer timeout (BENCH_r03.json recorded rc=124 ~25 min in), so bench
    # must finish — headline, secondaries, final re-emit, teardown gap —
    # inside its own deadline or the record loses its tail.
    total_budget = float(os.environ.get("SR_BENCH_TOTAL_BUDGET", "1380"))
    t0 = time.monotonic()

    def remaining():
        return total_budget - (time.monotonic() - t0)

    # Provisional zero record FIRST: if an outer supervisor kills this
    # process mid-measurement (wedged relay + an external timeout), the
    # stdout tail still parses.  Every later emission supersedes it.
    print(json.dumps(_zero_record(
        "provisional record — bench was killed before the measurement "
        "(or its retry) completed")), flush=True)

    # Participate in the repo-wide chip mutex before any device use.
    lock = _ChipLock()
    if not lock.acquire(deadline_s=min(600.0, remaining() - 60)):
        print(json.dumps(_zero_record(
            "chip lock busy: another process held SR_CHIP_LOCK past the "
            "wait deadline; refusing to race an in-flight claim")),
            flush=True)
        return

    # ESPCN x4 -> 1080p output, batch of video frames (headline), measured
    # in a bounded subprocess: an honest zero record is the last resort,
    # not the first response to a failed claim.
    result, reason = _headline_attempt(
        int(min(900, max(120, remaining() - 90))))
    if result is None and reason.startswith("rc="):
        # Deterministic child failure (clean nonzero exit), not a wedge:
        # one immediate retry after the teardown gap covers flaky attach
        # errors; no quiet period needed because nothing was SIGKILLed.
        time.sleep(_CLAIM_GAP_S)
        result, reason2 = _headline_attempt(
            int(min(600, max(120, remaining() - 60))))
        reason = f"{reason} then {reason2}" if result is None else "ok"
    elif result is None and reason == "timeout":
        # Wedge signature: the timed-out child was SIGKILLed while
        # attached, which itself wedges the relay 20-30 min.  A fast
        # retry is exactly the cadence that KEEPS it wedged — retry only
        # after a >=600 s quiet period AND a cheap probe, and only if the
        # global budget still allows a real measurement afterwards.
        need = _WEDGE_QUIET_S + 300 + 420  # quiet + probe + measurement
        if remaining() > need:
            print(f"# sleeping {_WEDGE_QUIET_S}s (patient wedge-recovery "
                  f"gate), then probe-gated retry", file=sys.stderr)
            time.sleep(_WEDGE_QUIET_S)
            if _chip_probe(300):
                result, reason2 = _headline_attempt(
                    int(min(600, max(120, remaining() - 60))))
                reason = ("timeout then " + reason2) if result is None else "ok"
            else:
                reason = "timeout; post-quiet probe also unresponsive"
        else:
            print("# no budget for a patient (>=600s quiet) retry; a fast "
                  "retry would keep the relay wedged — emitting the zero "
                  "record instead", file=sys.stderr)
    if result is None:
        print(json.dumps(_zero_record(
            f"device unreachable: headline failed ({reason}); wedge-safe "
            f"retry policy exhausted within the {int(total_budget)}s "
            f"budget")), flush=True)
        return
    # Emit the headline IMMEDIATELY: secondary rows can still be cut by an
    # outer kill — the one required JSON line must never be hostage to
    # them.  It is emitted AGAIN as the very last stdout line (the driver's
    # capture parses from the tail; round-2 lesson: BENCH_r02.json recorded
    # `parsed: null` when the only JSON line was early).
    print(json.dumps(result), flush=True)
    # The child held the device claim; give its teardown the measured gap
    # before the NEXT process attaches for the secondary rows (claiming
    # while a teardown is in flight futex-waits forever — CLAUDE.md
    # hazard 2).
    time.sleep(_CLAIM_GAP_S)
    try:
        os.unlink(_ROWS_STATUS_PATH)
    except OSError:
        pass
    try:
        # Secondary rows run in their OWN bounded subprocess; this parent
        # never attaches.  Round-4 preview evidence (bench_r4_preview2.err):
        # the in-parent attach wedged once and every later row then hung on
        # the half-attached client, burning 600 s on three doomed rows.
        _run_secondaries_subprocess(
            seconds=t0 + total_budget - 60 - time.monotonic())
    finally:
        # Final stdout line = the headline JSON, on EVERY exit path, now
        # carrying the secondary-row coverage the child recorded.
        try:
            with open(_ROWS_STATUS_PATH) as f:
                st = json.load(f)
            result["secondary_rows"] = {
                "completed": len(st.get("completed", [])),
                "skipped": st.get("skipped", [])}
        except (OSError, ValueError):
            pass
        print(json.dumps(result), flush=True)
        # Teardown spacing while still holding the flock, so the next
        # with_chip holder can't claim into our client's teardown.
        time.sleep(_CLAIM_GAP_S)


def _run_secondaries_subprocess(seconds: float):
    """Run the secondary rows in a bounded child process.

    The parent stays chip-free for its whole life: its only jobs are the
    flock, the two bounded children, and the final stdout re-emit.  A child
    whose first attach wedges kills itself (exit 86, see _secondary_rows);
    a child that overruns gets SIGTERM then SIGKILL — ugly for the relay
    (CLAUDE.md hazard 2) but bench is the round's last chip user.
    """
    import subprocess

    if seconds < 60:
        print(f"# no budget for secondary rows ({seconds:.0f}s left)",
              file=sys.stderr)
        return
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--secondary-only",
         str(int(seconds - 30))],
        stdout=sys.stderr, stderr=sys.stderr)
    try:
        rc = proc.wait(timeout=seconds)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
        print("# secondary-row child overran its budget; terminated",
              file=sys.stderr)
        return
    if rc == 86:
        print("# secondary-row child bailed: first row timed out before any "
              "row completed (attach-wedge signature) — remaining rows "
              "would hang on the same dead client", file=sys.stderr)
    elif rc != 0:
        print(f"# secondary-row child exited rc={rc}", file=sys.stderr)


def _secondary_rows(deadline: float):
    """Secondary rows, value-first under a global deadline.

    Ordering rationale (VERDICT r3 weak #1: the driver killed the bench
    mid-secondaries and the round's best rows never reached the record):
    the folded-tail and fused-VDSR rows — the round's headline wins — run
    FIRST; the one row with a pathological failure mode (fused-ESPCN's
    Mosaic compile, observed >600 s on this relay) runs LAST so it can only
    ever cost its own slot.  Each row also keeps a per-row SIGALRM bound,
    clamped to the time left before the deadline.
    """
    def xla_row(label, **kw):
        def run():
            ov = kw.pop("overrides", None)
            if ov and ov.get("dtype") == "bf16":
                import jax.numpy as jnp

                ov = {"dtype": jnp.bfloat16}
            mps_i, dt_i = bench_model_mps(
                kw["name"], kw["scale"], kw["out_hw"], kw["batch"],
                kw["channels"], overrides=ov)
            print(f"# {label} x4 -> 1080p: {mps_i:.1f} MP/s "
                  f"({dt_i*1e3:.2f} ms)", file=sys.stderr)
        return run

    rows = [
        # -- the round's best results first (cheap XLA compiles) ----------
        ("edsr-composed rows", 420, bench_edsr_composed),
        ("srresnet-folded", 240, lambda: bench_srresnet_folded(batches=(1,))),
        ("edsr-folded", 240, lambda: bench_edsr_folded(batches=(1,))),
        ("lane-packed rows", 360, bench_lane_packed),
        ("edsr-full-folded", 240, bench_edsr_full_folded),
        ("edsr-full-int8", 300, bench_edsr_full_int8),
        ("vdsr-fused", 300, bench_vdsr_fused),  # Mosaic, but ~7 s compile
        # -- never-landed capability rows, early viable slots (VERDICT r4
        # weak #5: serve-load and host-ingest missed every driver record
        # r1-r4; srcnn last landed in r2).  host-ingest is host-only (60 s);
        # serve-load-quick is one client count at ~1/4 the request volume.
        ("srcnn", 180, xla_row(
            "srcnn", name="srcnn", scale=4, out_hw=(1080, 1920), batch=1,
            channels=1)),
        ("host-ingest", 60, bench_host_ingest),
        ("serve-load-quick", 240,
         lambda: bench_serve_load(client_counts=(4,), per_client=5)),
        # -- int8 PTQ rows (MXU int8 path) ---------------------------------
        ("int8 rows", 420, bench_int8),
        # -- XLA zoo comparison rows ---------------------------------------
        ("espcn-bf16-b8", 180, xla_row(
            "espcn-bf16-b8", name="espcn", scale=4, out_hw=(1080, 1920),
            batch=8, channels=1, overrides={"dtype": "bf16"})),
        ("espcn-f32", 180, xla_row(
            "espcn-f32", name="espcn", scale=4, out_hw=(1080, 1920),
            batch=8, channels=1)),
        ("srresnet-bf16", 180, xla_row(
            "srresnet-bf16", name="srresnet", scale=4, out_hw=(1080, 1920),
            batch=1, channels=3, overrides={"dtype": "bf16"})),
        ("edsr-bf16-b4", 180, xla_row(
            "edsr-bf16-b4", name="edsr", scale=4, out_hw=(1080, 1920),
            batch=4, channels=3, overrides={"dtype": "bf16"})),
        ("vdsr-bf16", 180, xla_row(
            "vdsr-bf16", name="vdsr", scale=4, out_hw=(1080, 1920),
            batch=1, channels=1, overrides={"dtype": "bf16"})),
        # -- batch-scaling rows --------------------------------------------
        ("srresnet-folded-b4", 240, lambda: bench_srresnet_folded(batches=(4,))),
        ("edsr-folded-b4", 240, lambda: bench_edsr_folded(batches=(4,))),
        ("srresnet", 180, xla_row(
            "srresnet", name="srresnet", scale=4, out_hw=(1080, 1920),
            batch=1, channels=3)),
        ("vdsr", 180, xla_row(
            "vdsr", name="vdsr", scale=4, out_hw=(1080, 1920), batch=1,
            channels=1)),
        ("srresnet-bf16-b4", 180, xla_row(
            "srresnet-bf16-b4", name="srresnet", scale=4,
            out_hw=(1080, 1920), batch=4, channels=3,
            overrides={"dtype": "bf16"})),
        # -- K2 head + full serving scaling curve ---------------------------
        ("vdsr-pallas-head", 300, bench_vdsr_pallas_head),
        ("serve-load", 300, lambda: bench_serve_load(port=8694)),
        ("virtual-mesh", 300, bench_virtual_mesh_scaling),
        # -- the pathological Mosaic compile, LAST by design ----------------
        ("espcn-pallas rows", 600, bench_fused_espcn),
    ]
    completed = 0
    done_labels: list = []
    skipped: list = []
    for idx, (label, budget, thunk) in enumerate(rows):
        left = deadline - time.monotonic()
        if left < 30:
            skipped = [lb for lb, _, _ in rows[idx:]]
            print(f"# secondary-row deadline reached; skipping: "
                  f"{', '.join(skipped)}", file=sys.stderr)
            break
        guard = _bounded(int(min(budget, left)), label)
        with guard:
            try:
                thunk()
            except TimeoutError:
                raise
            except Exception as e:
                print(f"# {label} bench failed: {e}", file=sys.stderr)
        if guard.fired and completed == 0:
            # Attach-wedge signature: the very first device row hung.  A
            # SIGALRM unwound the frame but this process keeps a
            # half-attached client — every later row would hang the same
            # way (measured: bench_r4_preview2.err).  Bail out.
            _write_rows_status(done_labels, [lb for lb, _, _ in rows
                                            if lb not in done_labels])
            sys.exit(86)
        if not guard.fired:
            completed += 1
            done_labels.append(label)
        else:
            skipped.append(f"{label} (row timeout)")
    # Coverage record for the driver (VERDICT r4 weak #5 / next #6): the
    # parent folds this into the final headline JSON so the record carries
    # which rows ran and which were cut, not just a stderr tail comment.
    _write_rows_status(done_labels, skipped)


def _write_rows_status(done, skipped):
    try:
        with open(_ROWS_STATUS_PATH, "w") as f:
            json.dump({"completed": done, "skipped": skipped}, f)
    except OSError:
        pass


class _bounded:
    """SIGALRM time-box for optional rows: a pathologically slow Mosaic
    compile (observed >25 min for deep fused kernels on this relay) must
    not eat the bench budget.  Main-thread only; the row's own try/except
    reports the interruption.  ``swallow=False`` re-raises the TimeoutError
    to the caller (used by the headline's wedge guard)."""

    def __init__(self, seconds: int, label: str, swallow: bool = True):
        self.seconds, self.label, self.swallow = seconds, label, swallow
        self.fired = False

    def __enter__(self):
        import signal

        def handler(signum, frame):
            # Record the firing HERE: jax can wrap the TimeoutError inside
            # its own RuntimeError during backend init, in which case the
            # row's `except Exception` swallows it before __exit__ sees it.
            self.fired = True
            raise TimeoutError(f"{self.label}: exceeded {self.seconds}s budget")

        self._old = signal.signal(signal.SIGALRM, handler)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        import signal

        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        if exc and exc[0] is TimeoutError:
            print(f"# {self.label}: timed out ({self.seconds}s budget)",
                  file=sys.stderr)
            return self.swallow
        return False


def bench_fused_espcn():
    """Fused Pallas ESPCN row (v1; v2 retired — see kernels/attic/)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.espcn_fused import (
            espcn_fused_forward,
            extract_espcn_weights,
        )
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="espcn", scale=4, channels=1))
        x = jnp.asarray(
            np.random.default_rng(0).random((8, 270, 480, 1)), dtype=jnp.float32
        )
        v = m.init(jax.random.key(0), x[:1], train=False)
        wts = extract_espcn_weights(v["params"])
        mp = 8 * 1080 * 1920 / 1e6
        rows = [
            ("espcn-pallas-v1", lambda w, inp: espcn_fused_forward(w, inp, 4)),
        ]
        for label, fwd in rows:
            try:
                dtf = _iter_time(fwd, wts, x, iters=10)
                print(f"# {label} x4 -> 1080p: {mp/dtf:.1f} MP/s "
                      f"({dtf*1e3:.2f} ms)", file=sys.stderr)
            except TimeoutError:
                # A mid-row SIGALRM must reach the _bounded context manager;
                # swallowing it here would run the remaining rows unbounded.
                raise
            except Exception as e:
                print(f"# {label} bench failed: {e}", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# espcn-pallas bench failed: {e}", file=sys.stderr)


def bench_vdsr_fused():
    """Whole-net fused VDSR (segments of layers VMEM-resident, bf16 MXU)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.vdsr_fused import vdsr_fused_forward
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="vdsr", scale=4, channels=1))
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 1080, 1920, 1)), jnp.float32
        )
        v = m.init(jax.random.key(0), x[:1], train=False)

        def fwd(params, inp):
            return vdsr_fused_forward(params, inp)

        dtf = _iter_time(fwd, v["params"], x, iters=4)
        print(f"# vdsr-fused-bf16 x4 -> 1080p: {1080*1920/1e6/dtf:.1f} MP/s "
              f"({dtf*1e3:.2f} ms)", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# vdsr-fused bench failed: {e}", file=sys.stderr)


def bench_vdsr_pallas_head():
    """VDSR with the K2 fused residual head (sr upscale --pallas route)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import vdsr_pallas_forward
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="vdsr", scale=4, channels=1))
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 1080, 1920, 1)), jnp.float32
        )
        v = m.init(jax.random.key(0), x[:1], train=False)

        def fwd(params, inp):
            return vdsr_pallas_forward(params, inp)

        dtf = _iter_time(fwd, v["params"], x, iters=5)
        print(f"# vdsr-pallas-head x4 -> 1080p: {1080*1920/1e6/dtf:.1f} MP/s "
              f"({dtf*1e3:.2f} ms)", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# vdsr-pallas-head bench failed: {e}", file=sys.stderr)


def bench_srresnet_folded(batches=(1, 4)):
    """SRResNet with the tail conv folded into pre-shuffle space
    (kernels/apply.py fold_tail_weights): the HR 9x9x64->3 conv — the
    model's worst MXU shape — runs as 5x5x256->12 at LR."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import srresnet_folded_forward
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="srresnet", scale=4, channels=3))
        for nb in batches:
            x = jnp.asarray(
                np.random.default_rng(0).random((nb, 270, 480, 3)), jnp.float32
            )
            v = m.init(jax.random.key(0), x[:1], train=False)

            def fwd(var, inp):
                return srresnet_folded_forward(
                    var["params"], var.get("batch_stats", {}), inp, 4,
                    dtype=jnp.bfloat16,
                )

            dtf = _iter_time(fwd, v, x, iters=5)
            mp = nb * 1080 * 1920 / 1e6
            print(f"# srresnet-folded-bf16-b{nb} x4 -> 1080p: {mp/dtf:.1f} MP/s "
                  f"({dtf*1e3:.2f} ms)", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# srresnet-folded bench failed: {e}", file=sys.stderr)


def bench_edsr_folded(batches=(1, 4)):
    """EDSR with the tail conv folded into pre-shuffle space (same recast
    as srresnet_folded — the 3x3 feat->3 HR tail is equally lane-starved)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="edsr", scale=4, channels=3))
        for nb in batches:
            x = jnp.asarray(
                np.random.default_rng(0).random((nb, 270, 480, 3)), jnp.float32
            )
            v = m.init(jax.random.key(0), x[:1], train=False)

            def fwd(var, inp):
                return edsr_folded_forward(
                    var["params"], inp, 4, dtype=jnp.bfloat16)

            dtf = _iter_time(fwd, v, x, iters=5)
            mp = nb * 1080 * 1920 / 1e6
            print(f"# edsr-folded-bf16-b{nb} x4 -> 1080p: {mp/dtf:.1f} MP/s "
                  f"({dtf*1e3:.2f} ms)", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# edsr-folded bench failed: {e}", file=sys.stderr)


def bench_lane_packed():
    """Batch-to-lanes packed inference rows (kernels/apply.py
    pack_blockdiag_params): two frames ride the channel axis so 64-feature
    trunk convs become 128-wide and fill the MXU's lanes.  MFU probes
    measured the packed useful rate at 1.52x the unpacked one for identical
    math (runs/probe_mfu.err: 97.6 vs 64.4 TFLOP/s); these rows show what
    that buys end-to-end vs the edsr-folded-b2 / vdsr-bf16 rows."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import (
            edsr_folded_packed_forward,
            pack_blockdiag_params,
            vdsr_packed_forward,
        )
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="edsr", scale=4, channels=3))
        for nb in (2, 4):
            try:
                x = jnp.asarray(np.random.default_rng(0).random(
                    (nb, 270, 480, 3)), jnp.float32)
                v = m.init(jax.random.key(0), x[:1], train=False)
                pp = pack_blockdiag_params(v["params"], reps=2, scale=4)

                def fwd(q, inp):
                    return edsr_folded_packed_forward(
                        q, inp, 4, reps=2, dtype=jnp.bfloat16)

                dtf = _iter_time(fwd, pp, x, iters=5)
                mp = nb * 1080 * 1920 / 1e6
                print(f"# edsr-folded-packed2-b{nb} x4 -> 1080p: "
                      f"{mp/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)", file=sys.stderr)
            except TimeoutError:
                raise
            except Exception as e:
                print(f"# edsr-folded-packed2-b{nb} failed: {e}",
                      file=sys.stderr)
        try:
            mv = build_model(ModelConfig(name="vdsr", scale=4, channels=1))
            x = jnp.asarray(np.random.default_rng(0).random(
                (2, 1080, 1920, 1)), jnp.float32)
            v = mv.init(jax.random.key(0), x[:1], train=False)
            pp = pack_blockdiag_params(v["params"], reps=2)

            def fwd(q, inp):
                return vdsr_packed_forward(q, inp, reps=2, dtype=jnp.bfloat16)

            dtf = _iter_time(fwd, pp, x, iters=4)
            print(f"# vdsr-packed2-b2 x4 -> 1080p: "
                  f"{2*1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)",
                  file=sys.stderr)
        except TimeoutError:
            raise
        except Exception as e:
            print(f"# vdsr-packed2-b2 failed: {e}", file=sys.stderr)
        try:
            from ml_super_resolution_tpu.kernels.apply import (
                srresnet_folded_packed_forward,
            )

            ms = build_model(ModelConfig(name="srresnet", scale=4, channels=3))
            x = jnp.asarray(np.random.default_rng(0).random(
                (2, 270, 480, 3)), jnp.float32)
            v = ms.init(jax.random.key(0), x[:1], train=False)
            pp = pack_blockdiag_params(v["params"], reps=2, scale=4)
            ps = pack_blockdiag_params(v.get("batch_stats", {}), reps=2,
                                       scale=4)

            def fwd(q, inp):
                return srresnet_folded_packed_forward(
                    q, ps, inp, 4, reps=2, dtype=jnp.bfloat16)

            dtf = _iter_time(fwd, pp, x, iters=4)
            print(f"# srresnet-folded-packed2-b2 x4 -> 1080p: "
                  f"{2*1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)",
                  file=sys.stderr)
        except TimeoutError:
            raise
        except Exception as e:
            print(f"# srresnet-folded-packed2-b2 failed: {e}", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# lane-packed bench failed: {e}", file=sys.stderr)


def bench_edsr_full_folded():
    """Full-paper EDSR (32 blocks x 256 features, 43M params) folded row:
    the 256-wide trunk fills both MXU lane halves, so this row carries the
    repo's peak measured model MFU (probe: 105.9 trunk TFLOP/s ~ 54% of the
    v5e's 197 bf16 peak, vs ~32 TFLOP/s for the 64-feature baseline — the
    lane-occupancy ceiling made visible in the driver record)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import edsr_folded_forward
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(
            name="edsr", scale=4, channels=3,
            overrides={"num_blocks": 32, "features": 256, "res_scale": 0.1}))
        x = jnp.asarray(np.random.default_rng(0).random((1, 270, 480, 3)),
                        jnp.float32)
        v = m.init(jax.random.key(0), x[:1], train=False)

        def fwd(var, inp):
            return edsr_folded_forward(var["params"], inp, 4,
                                       dtype=jnp.bfloat16)

        dtf = _iter_time(fwd, v, x, iters=2)
        tfl = 32 * 2 * 2 * 270 * 480 * 9 * 256 * 256 / dtf / 1e12
        print(f"# edsr-full-folded-bf16-b1 x4 -> 1080p: "
              f"{1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)  "
              f"trunk {tfl:.1f} TFLOP/s", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# edsr-full-folded bench failed: {e}", file=sys.stderr)


def bench_edsr_composed():
    """Composed one-conv glue rows (kernels/apply.py edsr_composed_forward,
    the round-5 default edsr route): the staged glue measured 4.93 of the
    baseline's 9.8 ms frame and 31.06 of the flagship's 90.3 ms
    (runs/probe_trunk_gap.err); composition cuts its FLOPs ~20x.  The
    packed-b2 row tests whether the composed glue finally makes batch 2
    beat two b1 dispatches (VERDICT r4 weak #3)."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.kernels.apply import (
            edsr_composed_forward,
            edsr_composed_packed_forward,
            edsr_glue_plan,
            pack_blockdiag_params,
        )
        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(name="edsr", scale=4, channels=3))
        x4 = jnp.asarray(np.random.default_rng(0).random((4, 270, 480, 3)),
                         jnp.float32)
        v = m.init(jax.random.key(0), x4[:1], train=False)
        # plan precomputed EAGERLY and passed as a jit argument: rebuilding
        # the fold/compose chain inside the timed loop is not hoisted by
        # XLA and costs ~10 ms/call (measured, runs/bench_r5_preview.err)
        vplan = (v, edsr_glue_plan(v["params"], 4))

        def fwd(vp, inp):
            var, plan = vp
            return edsr_composed_forward(var["params"], inp, 4,
                                         dtype=jnp.bfloat16, plan=plan)

        for nb in (1, 2):
            try:
                dtf = _iter_time(fwd, vplan, x4[:nb], iters=6)
                print(f"# edsr-composed-bf16-b{nb} x4 -> 1080p: "
                      f"{nb*1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)",
                      file=sys.stderr)
            except TimeoutError:
                raise
            except Exception as e:
                print(f"# edsr-composed-b{nb} failed: {e}", file=sys.stderr)
        try:
            pp = pack_blockdiag_params(v["params"], reps=2, scale=4)
            pplan = (pp, edsr_glue_plan(pp, 4))

            def pfwd(qp, inp):
                q, plan = qp
                return edsr_composed_packed_forward(q, inp, 4, reps=2,
                                                    dtype=jnp.bfloat16,
                                                    plan=plan)

            dtf = _iter_time(pfwd, pplan, x4[:2], iters=6)
            print(f"# edsr-composed-packed2-b2 x4 -> 1080p: "
                  f"{2*1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)",
                  file=sys.stderr)
        except TimeoutError:
            raise
        except Exception as e:
            print(f"# edsr-composed-packed2-b2 failed: {e}", file=sys.stderr)
        try:
            mf = build_model(ModelConfig(
                name="edsr", scale=4, channels=3,
                overrides={"num_blocks": 32, "features": 256,
                           "res_scale": 0.1}))
            vf = mf.init(jax.random.key(0), x4[:1], train=False)
            vfplan = (vf, edsr_glue_plan(vf["params"], 4))

            def ffwd(vp, inp):
                var, plan = vp
                return edsr_composed_forward(var["params"], inp, 4,
                                             res_scale=0.1,
                                             dtype=jnp.bfloat16, plan=plan)

            dtf = _iter_time(ffwd, vfplan, x4[:1], iters=2)
            tfl = 32 * 2 * 2 * 270 * 480 * 9 * 256 * 256 / dtf / 1e12
            print(f"# edsr-full-composed-bf16-b1 x4 -> 1080p: "
                  f"{1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)  "
                  f"trunk {tfl:.1f} TFLOP/s", file=sys.stderr)
        except TimeoutError:
            raise
        except Exception as e:
            print(f"# edsr-full-composed failed: {e}", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# edsr-composed bench failed: {e}", file=sys.stderr)


def bench_edsr_full_int8():
    """Production-leg row for the 43M flagship (VERDICT r4 next #3): the
    full-paper EDSR quantized int8 over its folded-tail recast — the deploy
    config `sr serve --int8` would run.  Quality evidence lives in
    runs/int8_edsr_full_chip.json; this is the speed side."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.quant import int8_apply_fn
        from ml_super_resolution_tpu.utils.config import ModelConfig

        m = build_model(ModelConfig(
            name="edsr", scale=4, channels=3,
            overrides={"num_blocks": 32, "features": 256, "res_scale": 0.1}))
        x = jnp.asarray(np.random.default_rng(0).random((1, 270, 480, 3)),
                        jnp.float32)
        v = m.init(jax.random.key(0), x[:1], train=False)
        qfn = int8_apply_fn(m, v, "edsr", 4, x[:1], impl="conv",
                            dtype=jnp.bfloat16)
        raw, qtree = qfn.func, qfn.args[0]
        dtf = _iter_time(lambda q, inp: raw(q, inp), qtree, x, iters=2)
        print(f"# edsr-full-int8-b1 x4 -> 1080p: "
              f"{1080*1920/1e6/dtf:.1f} MP/s ({dtf*1e3:.2f} ms)",
              file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# edsr-full-int8 bench failed: {e}", file=sys.stderr)


def bench_serve_load(client_counts=(1, 4, 8), per_client: int = 15,
                     port: int = 8693):
    """HTTP serving load rows: requests/s vs concurrent client count against
    the micro-batched /upscale endpoint (bf16 trunk, 128x128 -> 512x512).
    One server session, one row per client count — the scaling curve shows
    whether micro-batching actually amortizes dispatches under load.
    ``port`` must differ across invocations in one process: the daemon
    server thread of an earlier row still holds its listening socket."""
    try:
        import io
        import threading
        import time as _t
        import urllib.request

        import jax
        from PIL import Image

        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.serve import serve
        from ml_super_resolution_tpu.train.trainer import Trainer
        from ml_super_resolution_tpu.utils.config import (
            ExperimentConfig,
            ModelConfig,
        )

        cfg = ExperimentConfig(model=ModelConfig(name="espcn", scale=4,
                                                 channels=1))
        trainer = Trainer(cfg, workdir=None)
        state = trainer.init_state(0)
        ready = threading.Event()
        th = threading.Thread(
            target=serve, args=(trainer, state, cfg),
            kwargs=dict(port=port, ready_event=ready, bf16=True,
                        window_ms=6.0),
            daemon=True,
        )
        th.start()
        assert ready.wait(timeout=60)

        img = (np.random.default_rng(0).random((128, 128, 3)) * 255).astype(
            np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        body = buf.getvalue()

        def post_once():
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/upscale", data=body, method="POST")
            with urllib.request.urlopen(rq, timeout=120) as r:
                r.read()

        post_once()  # warm: compile the serving program

        # stop flag: if the _bounded SIGALRM interrupts a row on the main
        # thread, the client threads must not keep hammering the in-process
        # server and contend with the NEXT bench's device measurements
        stop: list = []
        try:
            for clients in client_counts:
                done = [0] * clients

                def client(i):
                    for _ in range(per_client):
                        if stop:
                            return
                        post_once()
                        done[i] += 1

                t0 = _t.perf_counter()
                ths = [threading.Thread(target=client, args=(i,),
                                        daemon=True)
                       for i in range(clients)]
                for t in ths:
                    t.start()
                for t in ths:
                    t.join(timeout=250)
                dt = _t.perf_counter() - t0
                n = sum(done)
                print(f"# serve-load (espcn-bf16 x4, {clients} clients, "
                      f"128px): {n/dt:.1f} req/s over {n} reqs ({dt:.1f}s)",
                      file=sys.stderr)
        finally:
            stop.append(1)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# serve-load bench failed: {e}", file=sys.stderr)


def bench_int8():
    """PTQ int8 inference rows (quant.py): int8 x int8 -> int32 on the MXU
    runs at 2x the bf16 MAC rate on v5e, so these rows chase the bf16
    configs (espcn-bf16-b32 headline, edsr-bf16-b4).  Both executors are
    measured — "conv" (integer conv_general_dilated) and "dot" (im2col +
    int8 dot_general) — because which one the remote compiler lowers onto
    the int8 systolic path is a compiler property, not ours."""
    try:
        import jax
        import jax.numpy as jnp

        from ml_super_resolution_tpu.models import build_model
        from ml_super_resolution_tpu.quant import int8_apply_fn
        from ml_super_resolution_tpu.utils.config import ModelConfig

        rows = [
            ("espcn-int8-b32", "espcn", 4, 1, 32, "conv", {}),
            ("espcn-int8dot-b32", "espcn", 4, 1, 32, "dot", {}),
            ("edsr-int8-b4", "edsr", 4, 3, 4, "conv", {}),
            ("edsr-int8dot-b4", "edsr", 4, 3, 4, "dot", {}),
        ]
        for label, name, scale, ch, batch, impl, ov in rows:
            try:
                m = build_model(
                    ModelConfig(name=name, scale=scale, channels=ch,
                                overrides=ov))
                x = jnp.asarray(np.random.default_rng(0).random(
                    (batch, 1080 // scale, 1920 // scale, ch)), jnp.float32)
                v = m.init(jax.random.key(0), x[:1], train=False)
                qfn = int8_apply_fn(m, v, name, scale, x[:1], impl=impl,
                                    dtype=jnp.bfloat16)
                # unwrap the partial so the quantized tree rides as a jit
                # argument through _iter_time, not a baked constant
                raw, qtree = qfn.func, qfn.args[0]
                dtf = _iter_time(lambda q, inp: raw(q, inp), qtree, x, iters=8)
                print(f"# {label} x{scale} -> 1080p: "
                      f"{batch*1080*1920/1e6/dtf:.1f} MP/s "
                      f"({dtf*1e3:.2f} ms/batch)", file=sys.stderr)
            except TimeoutError:
                raise
            except Exception as e:
                print(f"# {label} bench failed: {e}", file=sys.stderr)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"# int8 bench failed: {e}", file=sys.stderr)


def bench_host_ingest():
    """TileLoader host throughput: can the host feed the chip?  (HR uint8
    megapixels/sec shipped, decode-once/crop-many over the synthetic set.)"""
    try:
        import time as _t

        from ml_super_resolution_tpu.data.datasets import SyntheticImages
        from ml_super_resolution_tpu.data.loader import TileLoader

        loader = TileLoader(SyntheticImages(n=64, size=256), batch_size=32,
                            tile_size=192, num_workers=4)
        with loader:
            it = iter(loader)
            next(it)  # warm: first decodes fill the cache
            t0 = _t.perf_counter()
            nb = 0
            while _t.perf_counter() - t0 < 3.0:
                next(it)
                nb += 1
            dt = _t.perf_counter() - t0
        mps = nb * 32 * 192 * 192 / dt / 1e6
        print(f"# host-ingest (TileLoader): {mps:.0f} MP/s of HR tiles "
              f"({nb*32/dt:.0f} tiles/s)", file=sys.stderr)
    except Exception as e:
        print(f"# host-ingest bench failed: {e}", file=sys.stderr)


def bench_virtual_mesh_scaling():
    """DP + spatial-tiling scaling rows on the 8-virtual-device CPU mesh.

    Runs in a subprocess (JAX_PLATFORMS=cpu) so it never touches the chip.
    On this 1-core host the virtual devices timeshare, so the row proves the
    sharded programs compile/execute and reports per-shard shapes — wall
    clock is NOT expected to improve (no parallel silicon underneath).
    """
    import subprocess

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from ml_super_resolution_tpu.infer import upscale_frames
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.parallel.mesh import make_mesh
from ml_super_resolution_tpu.utils.config import ModelConfig

m = build_model(ModelConfig(name="espcn", scale=2, channels=1))
x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 1)), jnp.float32)
v = m.init(jax.random.key(0), x, train=False)
frames = (np.random.default_rng(1).random((1, 64, 64, 3)) * 255).astype(np.uint8)
rows = {}
for tiles in (1, 4, 8):
    mesh = make_mesh(dp=1, sp=tiles) if tiles > 1 else None
    t0 = time.perf_counter()
    out = np.asarray(upscale_frames(m, v, jnp.asarray(frames), "espcn", 2, mesh=mesh))
    rows[f"sp{tiles}"] = {"compile_plus_run_s": round(time.perf_counter() - t0, 2),
                          "shard_rows": 64 // tiles}
print(json.dumps(rows))
"""
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=280, cwd="/root/repo",
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        print(f"# virtual-mesh spatial tiling (8 CPU devices, functional): "
              f"{line}", file=sys.stderr)
    except Exception as e:
        print(f"# virtual-mesh scaling bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    if "--headline-only" in sys.argv[1:]:
        # Child mode for _headline_attempt: measure, print the one JSON
        # line, exit.  The parent bounds this process's lifetime and holds
        # the chip flock, so neither a SIGALRM guard nor a second lock is
        # needed here — a wedged claim just gets killed.
        print(json.dumps(_measure_headline()), flush=True)
    elif "--secondary-only" in sys.argv[1:]:
        # Child mode for _run_secondaries_subprocess: argv[-1] = seconds of
        # budget.  Exit 86 = attach-wedge bail (see _secondary_rows).
        _secondary_rows(deadline=time.monotonic() + float(sys.argv[-1]))
    else:
        main()
