#!/bin/bash
# Round-4 queue #4: takes over from master24 once its full-EDSR evals are done
# (the "variant A" banner in master24.log) so the chip is QUIET by ~01:05 UTC.
# Rationale: master24's tail was scheduled to 02:35, but the round started
# 17:27 and ends ~01:30 — the driver's end-of-round bench must find the chip
# flock free, or BENCH_r04 records the provisional zero.  This script keeps
# master24's experiment set (VERDICT #6 EDSR protocol A/B, #7 SRGAN patch-D)
# under hard absolute deadlines, ordered by evidence value:
#   SRGAN patch-A (8k steps, ~7 min compute at 19 steps/s)  -> by 00:20
#   EDSR-baseline x4 at zoo protocol batch-64 (<=20k steps) -> by 00:50
#   SRGAN patch-B (full D LR, partial ok)                   -> by 01:03
# In-train evals (eval-every) provide the quality curves; no standalone eval
# phase is scheduled so the tail cannot overrun.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

A_BY=$(date -u -d '2026-08-20 00:20' +%s)
B_BY=$(date -u -d '2026-08-20 00:50' +%s)
C_BY=$(date -u -d '2026-08-20 01:03' +%s)
TAKEOVER_BY=$(date -u -d '2026-08-19 23:59' +%s)

latest_step() {
  ls "$1/ckpts" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 || true
}

# train_until <deadline> <launch_guard_s> <chunk_timeout> <workdir> <inc> <max> <flags...>
train_until() {
  local by=$1 guard=$2 tmo=$3 wd=$4 inc=$5 maxs=$6; shift 6
  local strikes=0
  while :; do
    local cur; cur=$(latest_step "$wd"); cur=${cur:-0}
    [ "$cur" -ge "$maxs" ] && { echo "$wd: reached $cur >= $maxs"; break; }
    local now; now=$(date -u +%s)
    [ $((now + guard)) -ge "$by" ] && { echo "$wd: deadline, stop at $cur ($(date -u +%H:%M))"; break; }
    local tgt=$((cur + inc)); [ "$tgt" -gt "$maxs" ] && tgt=$maxs
    with_chip_wd 420 "$wd/metrics.jsonl" timeout "$tmo" \
      python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "$wd.log" 2>&1
    local rc=$?
    local newcur; newcur=$(latest_step "$wd"); newcur=${newcur:-0}
    echo "$wd: chunk -> $tgt rc=$rc now=$newcur ($(date -u +%H:%M))"
    if [ "$newcur" -le "$cur" ]; then
      strikes=$((strikes + 1))
      [ "$strikes" -ge 3 ] && { echo "$wd: 3 no-progress chunks, aborting phase"; return 1; }
    else
      strikes=0
    fi
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
      chip_health 6 || { echo "CHIP LOST in $wd"; return 1; }
    fi
  done
}

echo "=== master25 armed ($(date -u +%H:%M)); waiting for master24's eval banner ==="
M24=$(cat /tmp/master24.pid 2>/dev/null || echo 0)
while :; do
  grep -q "variant A" runs/master24.log 2>/dev/null && { echo "banner seen"; break; }
  kill -0 "$M24" 2>/dev/null || { echo "master24 gone"; break; }
  [ "$(date -u +%s)" -ge "$TAKEOVER_BY" ] && { echo "takeover deadline"; break; }
  sleep 30
done
kill "$M24" 2>/dev/null || true
echo "=== master25 takeover ($(date -u +%H:%M)) — master24 main shell stopped ==="
# Any in-flight master24 chunk keeps the flock until it exits cleanly; the
# with_chip_wd below simply queues behind it.

echo "=== srgan patch-D variant A: d-lr-scale 0.1 ($(date -u +%H:%M)) ==="
train_until "$A_BY" 480 700 runs/r4_srgan_patchA 2500 8000 \
  --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
  --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
  --d-lr-scale 0.1 --label-smooth 0.1 --d-patch 32 --d-augment \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

echo "=== edsr-baseline x4, zoo protocol (batch 64) ($(date -u +%H:%M)) ==="
train_until "$B_BY" 600 900 runs/r4_edsr_b64 5000 20000 \
  --model edsr --scale 4 --batch-size 64 --device-data --steps-per-call 8 \
  --lr-decay-steps 10000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 2500

echo "=== srgan patch-D variant B: full D LR ($(date -u +%H:%M)) ==="
train_until "$C_BY" 480 700 runs/r4_srgan_patchB 2500 8000 \
  --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
  --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
  --d-lr-scale 1.0 --label-smooth 0.1 --d-patch 32 --d-augment \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

echo "=== final chip health ($(date -u +%H:%M)) ==="
chip_health 3 && echo "chip healthy at close" || echo "WARNING: health probe failed"
echo "MASTER25 DONE ($(date -u +%H:%M)) — chip QUIET from here (driver bench next)"
