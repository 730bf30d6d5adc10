# Chip-claim mutex: source this and run EVERY chip-touching command via
# `with_chip <cmd...>`.
#
# Why (measured 2026-08-17): the attach relay has no claim queue — a process
# that tries to claim the chip while another process's attach or teardown is
# in flight futex-waits FOREVER (it is never woken on release), and killing
# an attached process wedges the relay for 20-30 min.  Serializing every
# claim through one flock, with a post-exit teardown gap, removes the race
# class entirely.
#
# Usage:
#   source /root/repo/tools/chiplock.sh
#   with_chip timeout 3600 python -m ml_super_resolution_tpu.cli train ...
#   with_chip timeout 120 python -c 'import jax; ...'   # health poll

SR_CHIP_LOCK=${SR_CHIP_LOCK:-/tmp/sr_chip.lock}
SR_CHIP_GAP=${SR_CHIP_GAP:-45}   # seconds of teardown spacing after exit

with_chip() {
  (
    flock -w 10800 9 || { echo "with_chip: lock timeout" >&2; exit 97; }
    "$@"
    rc=$?
    # let the claim fully release before the next holder attaches
    sleep "$SR_CHIP_GAP"
    exit $rc
  ) 9>"$SR_CHIP_LOCK"
}

# with_chip + silence watchdog.  Measured 2026-08-17 19:48: a training chunk
# can futex-wedge MID-RUN at an eval/readback boundary (not only at claim
# time), and a wedged holder then blocks the lock queue until its outer
# timeout.  The watchdog SIGTERMs the command (by PID, never by pattern)
# once its log file goes silent.
#   with_chip_wd <max_silence_s> <watch_file> <cmd...>
with_chip_wd() {
  local gap=$1 wf=$2
  shift 2
  (
    flock -w 10800 9 || { echo "with_chip_wd: lock timeout" >&2; exit 97; }
    # Silence is measured from NOW, not from the file's historical mtime:
    # a resumed run's stale metrics file (hours old) would otherwise trip
    # the watchdog ~20s after launch, before the trainer's first write
    # (observed 2026-08-19 19:05 — every r3_edsr_full chunk SIGTERMed at
    # birth because metrics.jsonl was 9.4h old).
    mkdir -p "$(dirname "$wf")" && touch "$wf"
    "$@" &
    pid=$!
    (
      exec 9>&-  # don't let the watchdog (or its sleeps) hold the lock
      while kill -0 "$pid" 2>/dev/null; do
        sleep 20
        if [ -e "$wf" ]; then
          age=$(( $(date +%s) - $(stat -c %Y "$wf") ))
          if [ "$age" -gt "$gap" ]; then
            echo "with_chip_wd: $wf silent ${age}s > ${gap}s; SIGTERM $pid" >&2
            kill -TERM "$pid" 2>/dev/null
            sleep 60
            kill -KILL "$pid" 2>/dev/null
            break
          fi
        fi
      done
    ) &
    wd=$!
    wait "$pid"
    rc=$?
    kill "$wd" 2>/dev/null
    sleep "$SR_CHIP_GAP"
    exit $rc
  ) 9>"$SR_CHIP_LOCK"
}

# Poll until a tiny on-chip op answers (post-wedge recovery gate).
#   chip_health [attempts] [probe_timeout_s] [spacing_s]
#
# Cadence lesson (measured 2026-08-17 22:30): a probe that times out is
# itself a SIGTERM of a mid-claim process — which is exactly the action
# that wedges the relay.  A fast-cadence gate (60 s probes / 90 s apart)
# can therefore KEEP a wedged relay wedged.  Defaults are now patient:
# 300 s probe budget (post-wedge claims can take minutes) and 600 s
# spacing so the relay gets real quiet time between failures.
chip_health() {
  local tries=${1:-12} budget=${2:-300} gap=${3:-600} i
  for i in $(seq 1 "$tries"); do
    if with_chip timeout "$budget" python -c \
      "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"; then
      return 0
    fi
    echo "chip_health: attempt $i not ready ($(date -u +%H:%M))" >&2
    sleep "$gap"
  done
  return 1
}
