#!/bin/bash
# Round-2 converged training queue, part 2 (heavy models).
# One TPU process at a time (CLAUDE.md hazard #2): strictly sequential.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== vdsr multiscale (joint x2/x3/x4), paper high-LR + clip + decay ==="
python -m ml_super_resolution_tpu.cli train --model vdsr --scale 3 --multi-scale \
  --steps 40000 --lr-decay-steps 12000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 5000 \
  --workdir runs/r2_vdsr_ms > runs/r2_vdsr_ms.log 2>&1
tail -2 runs/r2_vdsr_ms.log

echo "=== srresnet x4 (MSE), long schedule ==="
python -m ml_super_resolution_tpu.cli train --model srresnet --scale 4 \
  --steps 40000 --lr-decay-steps 15000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 5000 \
  --workdir runs/r2_srresnet_x4 > runs/r2_srresnet_x4.log 2>&1
tail -2 runs/r2_srresnet_x4.log
echo "QUEUE2 DONE"
