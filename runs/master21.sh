#!/bin/bash
# Round-4 queue #2 (starts strictly after master20 exits — ONE queue at a
# time, CLAUDE.md hazard 2):
#   1. SRGAN patch-wise D + D-augment, variant A (keep r3 rebalance:
#      d-lr-scale 0.1) and variant B (full D LR — the harder TASK replaces
#      the capacity/LR handicap).  VERDICT r3 weak #5 / next #7: done =
#      D accuracy off the 1.0 pin (~0.7-0.95) with adversarial term alive.
#   2. EDSR-baseline x4 protocol A/B: zoo batch-64 protocol vs the r3
#      paper-protocol run (batch 16), same lr decay, 20k steps each side
#      (VERDICT next #6: explain or close the 1.35 dB gap to VDSR).
#   3. f32 evals of all three runs.
#   4. full bench.py validation run (self-locking: run BARE, never under
#      with_chip) — VERDICT next #1 done-check: rc=0 + complete row tail.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== master21 start ($(date -u +%H:%M)) ==="
chip_health 12 || { echo "CHIP NEVER RECOVERED ($(date -u +%H:%M))"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== srgan patchD variant A: d-lr-scale 0.1 (r3 recipe + harder task) ==="
for tgt in 5000 10000; do
  with_chip_wd 420 runs/r4_srgan_patchA/metrics.jsonl timeout 2400 \
    python -m ml_super_resolution_tpu.cli train \
    --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
    --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
    --d-lr-scale 0.1 --label-smooth 0.1 --d-patch 32 --d-augment \
    --eval-every 1000 --ckpt-every 2500 --log-every 100 \
    --steps "$tgt" --workdir runs/r4_srgan_patchA >> runs/r4_srgan_patchA.log 2>&1
  tail -1 runs/r4_srgan_patchA.log
done

echo "=== srgan patchD variant B: full D LR (task replaces handicap) ==="
for tgt in 5000 10000; do
  with_chip_wd 420 runs/r4_srgan_patchB/metrics.jsonl timeout 2400 \
    python -m ml_super_resolution_tpu.cli train \
    --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
    --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
    --d-lr-scale 1.0 --label-smooth 0.1 --d-patch 32 --d-augment \
    --eval-every 1000 --ckpt-every 2500 --log-every 100 \
    --steps "$tgt" --workdir runs/r4_srgan_patchB >> runs/r4_srgan_patchB.log 2>&1
  tail -1 runs/r4_srgan_patchB.log
done

echo "=== edsr-baseline x4, zoo protocol (batch 64) A/B ($(date -u +%H:%M)) ==="
for tgt in 5000 10000 15000 20000; do
  with_chip_wd 420 runs/r4_edsr_b64/metrics.jsonl timeout 2400 \
    python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 64 --device-data --steps-per-call 8 \
    --lr-decay-steps 10000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r4_edsr_b64 >> runs/r4_edsr_b64.log 2>&1
  rc=$?
  tail -1 runs/r4_edsr_b64.log
  if [ "$rc" -ne 0 ]; then
    echo "chunk to $tgt rc=$rc; health-gating ($(date -u +%H:%M))"
    chip_health 10 || { echo "CHIP LOST mid-train"; break; }
  fi
done

echo "=== evals ($(date -u +%H:%M)) ==="
for wd in r4_srgan_patchA r4_srgan_patchB r4_edsr_b64; do
  with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
    --workdir "runs/$wd" --best > "runs/eval_${wd}.json" 2> "runs/eval_${wd}.err"
  echo "$wd: $(tail -1 runs/eval_${wd}.json)"
done

echo "=== full bench validation (self-locking, run bare) ($(date -u +%H:%M)) ==="
timeout 1500 python bench.py > runs/bench_r4_preview.out 2> runs/bench_r4_preview.err
echo "bench rc=$? ($(date -u +%H:%M))"
tail -2 runs/bench_r4_preview.out
grep -c '^#' runs/bench_r4_preview.err

echo "MASTER21 DONE ($(date -u +%H:%M))"
