#!/bin/bash
# Round-3 final-window queue:
#   EDSR x4 extension 40k -> 80k (still climbing ~+0.24 dB / 10k at 40k;
#   chunked restarts clear the relay leak, auto-resume from latest ckpt).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== edsr x4 extension to 80k ($(date -u +%H:%M)) ==="
for tgt in 50000 60000 70000 80000; do
  with_chip timeout 3300 python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
    --lr-decay-steps 10000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r3_edsr_x4 >> runs/r3_edsr_x4.log 2>&1
  tail -1 runs/r3_edsr_x4.log
done

echo "MASTER9 DONE ($(date -u +%H:%M))"
