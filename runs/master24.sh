#!/bin/bash
# Round-4 queue #3 (replaces master22 after its full-EDSR resume failed:
# the r3 checkpoint was saved with constant lr, and adding --lr-decay-*
# changes opt_state's pytree — orbax structure mismatch on every chunk).
# Full EDSR now trains FRESH in runs/r4_edsr_full with the decay schedule
# from step 0 (cleaner science than splicing schedules mid-run; the r3
# 1500-step smoke stays intact as committed evidence).
#
# Also adds a 3-strike no-progress guard to train_until: a chunk that
# fails without advancing latest_step 3x in a row aborts the phase
# instead of spinning until its deadline (master22 would have spun 3 h).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

NOW=$(date -u +%s)
EDSR_FULL_BY=$((NOW + 12300))   # ~23:30
EDSR_EVAL_BY=$((NOW + 14100))   # ~24:00
SRGAN_A_BY=$((NOW + 16500))     # ~00:40
SRGAN_B_BY=$((NOW + 18900))     # ~01:20
EDSR_B64_BY=$((NOW + 21900))    # ~02:10
ALL_BY=$((NOW + 23400))         # ~02:35 — chip quiet after this

latest_step() {
  ls "$1/ckpts" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 || true
}

# train_until <deadline> <workdir> <increment> <max_step> <flags...>
train_until() {
  local by=$1 wd=$2 inc=$3 maxs=$4; shift 4
  local strikes=0
  while :; do
    local cur; cur=$(latest_step "$wd"); cur=${cur:-0}
    [ "$cur" -ge "$maxs" ] && { echo "$wd: reached $cur >= $maxs"; break; }
    local now; now=$(date -u +%s)
    [ $((now + 1100)) -ge "$by" ] && { echo "$wd: deadline, stop at $cur ($(date -u +%H:%M))"; break; }
    local tgt=$((cur + inc)); [ "$tgt" -gt "$maxs" ] && tgt=$maxs
    with_chip_wd 420 "$wd/metrics.jsonl" timeout 1500 \
      python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "$wd.log" 2>&1
    local rc=$?
    local newcur; newcur=$(latest_step "$wd"); newcur=${newcur:-0}
    echo "$wd: chunk -> $tgt rc=$rc now=$newcur ($(date -u +%H:%M))"
    if [ "$newcur" -le "$cur" ]; then
      strikes=$((strikes + 1))
      if [ "$strikes" -ge 3 ]; then
        echo "$wd: 3 chunks with NO step progress — aborting phase (see $wd.log)"
        return 1
      fi
    else
      strikes=0
    fi
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
      chip_health 6 || { echo "CHIP LOST in $wd"; return 1; }
    fi
  done
}

echo "=== master24 start ($(date -u +%H:%M)) ==="
chip_health 12 || { echo "CHIP NEVER RECOVERED"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== bench preview: validate the NEW secondary rows on chip ($(date -u +%H:%M)) ==="
SR_BENCH_TOTAL_BUDGET=780 timeout 1700 python bench.py \
  > runs/bench_r4_preview2.out 2> runs/bench_r4_preview2.err
echo "bench rc=$? ($(date -u +%H:%M))"
tail -1 runs/bench_r4_preview2.out
grep '^#' runs/bench_r4_preview2.err | head -12

echo "=== full EDSR (32x256), FRESH with lr-decay, until $(date -u -d @$EDSR_FULL_BY +%H:%M) ==="
train_until "$EDSR_FULL_BY" runs/r4_edsr_full 1500 100000 \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
  --lr-decay-steps 20000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 2500

echo "=== full EDSR evals ($(date -u +%H:%M)) ==="
with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best \
  > runs/eval_edsr_full.json 2> runs/eval_edsr_full.err
echo "plain: $(tail -1 runs/eval_edsr_full.json)"
if [ "$(date -u +%s)" -lt "$EDSR_EVAL_BY" ]; then
  with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best --ensemble \
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

echo "MASTER24 DONE ($(date -u +%H:%M)) — chip quiet from here"
