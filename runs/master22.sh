#!/bin/bash
# Round-4 queue #2 (replaces master20's dead loop + master21; ONE chip queue
# at a time — CLAUDE.md hazard 2).  Every phase is DEADLINE-driven so an
# overrun self-trims instead of starving later phases; chunk targets are
# +INCREMENTS from the latest checkpoint (master20's absolute +10k targets
# kept each process in the leak-decay slow regime and its watchdog watched a
# stale mtime — both fixed).
#
#   0. health gate + bench.py chip validation (new flock/ordering code from
#      commit 200646e has never touched the chip; BENCH_r04 depends on it)
#   1. full paper EDSR (32x256) chunked +1500/chunk until the phase deadline
#      (VERDICT r3 missing #3) + plain/D4 evals
#   2. SRGAN patch-D variants A (d-lr 0.1) and B (full D LR)  (VERDICT #7)
#   3. EDSR-baseline x4 zoo-protocol (batch 64) A/B side      (VERDICT #6)
#   4. evals
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

NOW=$(date -u +%s)
BENCH_BY=$((NOW + 1500))        # ~19:58
EDSR_FULL_BY=$((NOW + 12600))   # ~23:05 — 3h of chunks
EDSR_EVAL_BY=$((NOW + 14400))   # ~23:35
SRGAN_A_BY=$((NOW + 17100))     # ~00:20
SRGAN_B_BY=$((NOW + 19800))     # ~01:05
EDSR_B64_BY=$((NOW + 23100))    # ~02:00
ALL_BY=$((NOW + 24300))         # ~02:20 — chip quiet after this

latest_step() {  # latest numeric ckpt dir in <workdir>/ckpts (0 if none)
  ls "$1/ckpts" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 || true
}

# train_until <deadline> <workdir> <increment> <max_step> <flags...>
train_until() {
  local by=$1 wd=$2 inc=$3 maxs=$4; shift 4
  while :; do
    local cur; cur=$(latest_step "$wd"); cur=${cur:-0}
    [ "$cur" -ge "$maxs" ] && { echo "$wd: reached $cur >= $maxs"; break; }
    local now; now=$(date -u +%s)
    # a chunk costs up to ~1500s; don't start one we can't afford
    [ $((now + 1100)) -ge "$by" ] && { echo "$wd: deadline, stop at $cur ($(date -u +%H:%M))"; break; }
    local tgt=$((cur + inc)); [ "$tgt" -gt "$maxs" ] && tgt=$maxs
    with_chip_wd 420 "$wd/metrics.jsonl" timeout 1500 \
      python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "$wd.log" 2>&1
    local rc=$?
    echo "$wd: chunk -> $tgt rc=$rc now=$(latest_step "$wd") ($(date -u +%H:%M))"
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
      chip_health 6 || { echo "CHIP LOST in $wd"; return 1; }
    fi
  done
}

echo "=== master22 start ($(date -u +%H:%M)) ==="
chip_health 12 || { echo "CHIP NEVER RECOVERED"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== bench.py chip validation, small secondary budget ($(date -u +%H:%M)) ==="
SR_BENCH_TOTAL_BUDGET=420 timeout 1400 python bench.py \
  > runs/bench_r4_preview.out 2> runs/bench_r4_preview.err
echo "bench rc=$? ($(date -u +%H:%M))"
tail -1 runs/bench_r4_preview.out
grep -c '^#' runs/bench_r4_preview.err || true

echo "=== full EDSR (32x256) chunked until $(date -u -d @$EDSR_FULL_BY +%H:%M) ==="
train_until "$EDSR_FULL_BY" runs/r3_edsr_full 1500 100000 \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
  --lr-decay-steps 20000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 2500

echo "=== full EDSR evals ($(date -u +%H:%M)) ==="
with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_full --best \
  > runs/eval_edsr_full.json 2> runs/eval_edsr_full.err
echo "plain: $(tail -1 runs/eval_edsr_full.json)"
if [ "$(date -u +%s)" -lt "$EDSR_EVAL_BY" ]; then
  with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r3_edsr_full --best --ensemble \
    > runs/ens_edsr_full.json 2> runs/ens_edsr_full.err
  echo "ens: $(tail -1 runs/ens_edsr_full.json)"
fi

echo "=== srgan patch-D variant A: d-lr-scale 0.1 ($(date -u +%H:%M)) ==="
train_until "$SRGAN_A_BY" runs/r4_srgan_patchA 2500 8000 \
  --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
  --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
  --d-lr-scale 0.1 --label-smooth 0.1 --d-patch 32 --d-augment \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

echo "=== srgan patch-D variant B: full D LR ($(date -u +%H:%M)) ==="
train_until "$SRGAN_B_BY" runs/r4_srgan_patchB 2500 8000 \
  --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
  --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
  --d-lr-scale 1.0 --label-smooth 0.1 --d-patch 32 --d-augment \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

echo "=== edsr-baseline x4, zoo protocol (batch 64) ($(date -u +%H:%M)) ==="
train_until "$EDSR_B64_BY" runs/r4_edsr_b64 1500 20000 \
  --model edsr --scale 4 --batch-size 64 --device-data --steps-per-call 8 \
  --lr-decay-steps 10000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 1000

echo "=== final evals ($(date -u +%H:%M)) ==="
for wd in r4_srgan_patchA r4_srgan_patchB r4_edsr_b64; do
  [ "$(date -u +%s)" -ge "$ALL_BY" ] && { echo "eval window over"; break; }
  [ -d "runs/$wd/ckpts" ] || continue
  with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
    --workdir "runs/$wd" --best > "runs/eval_${wd}.json" 2> "runs/eval_${wd}.err"
  echo "$wd: $(tail -1 runs/eval_${wd}.json)"
done

echo "MASTER22 DONE ($(date -u +%H:%M)) — chip quiet from here"
