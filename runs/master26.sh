#!/bin/bash
# Round-4 queue #5 (supersedes master24's tail and master25): same experiment
# set, two fixes from watching the live queue:
#   1. EDSR-full chunks were 1500 steps = 106 s of training per ~5 min of
#      attach/upload overhead (61% overhead).  With 124 GB of host RAM free
#      and zero step-rate decay observed inside 1500-step chunks at this
#      model's 14 steps/s (leak ~14 MB/s), 4500-step chunks are safe and
#      recover ~40% more training steps per chip-hour.
#   2. Hard absolute deadlines so the chip is QUIET by ~01:05 UTC: the round
#      started 17:27 and ends ~01:30; the driver's bench must find the flock
#      free or BENCH_r04 records the provisional zero.
# Order: EDSR-full (VERDICT #3) -> its evals -> SRGAN patch-A (#7) ->
# EDSR-b64 protocol A/B (#6) -> SRGAN patch-B (stretch) -> health probe.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

EDSR_BY=$(date -u -d '2026-08-19 23:20' +%s)
EVAL_BY=$(date -u -d '2026-08-19 23:50' +%s)
A_BY=$(date -u -d '2026-08-20 00:20' +%s)
B_BY=$(date -u -d '2026-08-20 00:48' +%s)
C_BY=$(date -u -d '2026-08-20 01:03' +%s)

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

echo "=== master26 start ($(date -u +%H:%M)); stopping master24's loop shell ==="
M24=$(cat /tmp/master24.pid 2>/dev/null || echo 0)
kill "$M24" 2>/dev/null || true
# master24's in-flight chunk (if any) keeps the flock until it exits cleanly;
# our first with_chip_wd queues behind it and resumes from its checkpoint.

echo "=== full EDSR (32x256), 4500-step chunks, until $(date -u -d @$EDSR_BY +%H:%M) ==="
train_until "$EDSR_BY" 800 1100 runs/r4_edsr_full 4500 100000 \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
  --lr-decay-steps 20000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 2500

echo "=== full EDSR evals ($(date -u +%H:%M)) ==="
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best \
  > runs/eval_edsr_full.json 2> runs/eval_edsr_full.err
echo "plain: $(tail -1 runs/eval_edsr_full.json)"
if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
  with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best --ensemble \
    > runs/ens_edsr_full.json 2> runs/ens_edsr_full.err
  echo "ens: $(tail -1 runs/ens_edsr_full.json)"
fi

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
echo "MASTER26 DONE ($(date -u +%H:%M)) — chip QUIET from here (driver bench next)"
