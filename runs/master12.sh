#!/bin/bash
# Round-3 session-3 clean queue (replaces the master9/10/11 pile-up whose
# flock mutual exclusion was broken by an accidental `rm -f` of the lock
# file — lesson recorded in CLAUDE.md):
#   0. health-gate after the 21:24 PID-kill of the wedged edsr chunk
#   1. on-chip D4 self-ensemble evals (quality table rows)
#   2. full bench.py preview (driver-evidence shape check)
#   3. full paper EDSR (32 blocks x 256 feats, ~43M params) chunked to 100k
#   4. final evals on the converged full EDSR (plain + ensemble)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== health gate ($(date -u +%H:%M)) ==="
chip_health 25 || { echo "CHIP NEVER RECOVERED ($(date -u +%H:%M))"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== on-chip ensemble evals ($(date -u +%H:%M)) ==="
ens () {  # ens <workdir> <tag> [extra args...]
  local wd=$1 tag=$2; shift 2
  with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
    --workdir "$wd" --best --ensemble "$@" \
    > "runs/ens_${tag}.json" 2> "runs/ens_${tag}.err"
  tail -1 "runs/ens_${tag}.json"
}
ens runs/r3_vdsr_ms    vdsr --scales 2,3,4
ens runs/r3_edsr_x4    edsr
ens runs/r3_srresnet_x4 srresnet
ens runs/r3_srgan_x4   srgan
ens runs/r3_srcnn_x2   srcnn

echo "=== full bench preview ($(date -u +%H:%M)) ==="
with_chip timeout 3000 python bench.py \
  > runs/bench_r3_final.out 2> runs/bench_r3_final.err
head -1 runs/bench_r3_final.out
tail -1 runs/bench_r3_final.out

echo "=== full EDSR (32x256) to 100k ($(date -u +%H:%M)) ==="
for tgt in 10000 20000 30000 40000 50000 60000 70000 80000 90000 100000; do
  with_chip_wd 420 runs/r3_edsr_full/metrics.jsonl timeout 1800 \
    python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
    --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
    --lr-decay-steps 20000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r3_edsr_full >> runs/r3_edsr_full.log 2>&1
  rc=$?
  tail -1 runs/r3_edsr_full.log
  if [ "$rc" -ne 0 ]; then
    echo "chunk to $tgt rc=$rc; health-gating before next ($(date -u +%H:%M))"
    chip_health 15 || { echo "CHIP LOST mid-train ($(date -u +%H:%M))"; break; }
  fi
done

echo "=== full EDSR final evals ($(date -u +%H:%M)) ==="
with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_full --best \
  > runs/eval_edsr_full.json 2> runs/eval_edsr_full.err
tail -1 runs/eval_edsr_full.json
with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_full --best --ensemble \
  > runs/ens_edsr_full.json 2> runs/ens_edsr_full.err
tail -1 runs/ens_edsr_full.json

echo "MASTER12 DONE ($(date -u +%H:%M))"
