#!/bin/bash
# Round-3 late-window quality queue (after master7):
#  1. SRGAN R1 variant — push D accuracy off 1.0 (VERDICT weak#5 stretch)
#  2. EDSR x2 — second scale for the EDSR row
#  3. VDSR joint extension 30k->45k (the leader; still climbing at 30k)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

M7=$(cat /tmp/master7.pid 2>/dev/null || echo 0)
while [ "$M7" -gt 0 ] && kill -0 "$M7" 2>/dev/null; do sleep 60; done
echo "=== master7 done; master8 starting ($(date -u +%H:%M)) ==="

echo "=== srgan r1 variant 6k ($(date -u +%H:%M)) ==="
for tgt in 3000 6000; do
  with_chip timeout 2400 python -m ml_super_resolution_tpu.cli train \
    --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
    --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
    --d-lr-scale 0.03 --label-smooth 0.2 --r1-gamma 10 \
    --eval-every 1000 --ckpt-every 3000 --log-every 100 \
    --steps "$tgt" --workdir runs/r3_srgan_r1 >> runs/r3_srgan_r1.log 2>&1
  tail -1 runs/r3_srgan_r1.log
done

echo "=== edsr x2, 20k ($(date -u +%H:%M)) ==="
for tgt in 10000 20000; do
  with_chip timeout 3300 python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 2 --batch-size 16 --device-data --steps-per-call 8 \
    --lr-decay-steps 10000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r3_edsr_x2 >> runs/r3_edsr_x2.log 2>&1
  tail -1 runs/r3_edsr_x2.log
done

echo "=== vdsr joint extension to 45k ($(date -u +%H:%M)) ==="
for tgt in 37500 45000; do
  with_chip timeout 3300 python -m ml_super_resolution_tpu.cli train \
    --model vdsr --scale 3 --multi-scale --device-data --steps-per-call 8 \
    --lr-decay-steps 10000 --lr-decay-rate 0.3 \
    --eval-every 3000 --ckpt-every 7500 \
    --steps "$tgt" --workdir runs/r3_vdsr_ms >> runs/r3_vdsr_ms.log 2>&1
  tail -1 runs/r3_vdsr_ms.log
done

echo "MASTER8 DONE ($(date -u +%H:%M))"
