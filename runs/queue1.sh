#!/bin/bash
# Round-2 converged training queue, part 1 (light models).
# One TPU process at a time (CLAUDE.md hazard #2): strictly sequential.
# Schedules sized from the observed eval curves (synthetic protocol
# plateaus far earlier than paper schedules on real data).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== srcnn x2 ==="
python -m ml_super_resolution_tpu.cli train --model srcnn --scale 2 \
  --steps 12000 --lr-decay-steps 5000 --lr-decay-rate 0.3 \
  --eval-every 1000 --ckpt-every 3000 \
  --workdir runs/r2_srcnn_x2 >> runs/r2_srcnn_x2.log 2>&1
tail -2 runs/r2_srcnn_x2.log

echo "=== espcn x3 ==="
python -m ml_super_resolution_tpu.cli train --model espcn --scale 3 \
  --steps 25000 --lr-decay-steps 10000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 \
  --workdir runs/r2_espcn_x3 > runs/r2_espcn_x3.log 2>&1
tail -2 runs/r2_espcn_x3.log

echo "=== espcn x2 ==="
python -m ml_super_resolution_tpu.cli train --model espcn --scale 2 \
  --steps 30000 --lr-decay-steps 12000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 \
  --workdir runs/r2_espcn_x2 > runs/r2_espcn_x2.log 2>&1
tail -2 runs/r2_espcn_x2.log

echo "=== espcn x4 ==="
python -m ml_super_resolution_tpu.cli train --model espcn --scale 4 \
  --steps 25000 --lr-decay-steps 10000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 \
  --workdir runs/r2_espcn_x4 > runs/r2_espcn_x4.log 2>&1
tail -2 runs/r2_espcn_x4.log
echo "QUEUE1 DONE"
