#!/bin/bash
# Round-2 training queue, part 3: SRGAN to an actual result (VERDICT #5).
# FeatureNet (self-trained perceptual backbone) -> adversarial phase from
# the converged srresnet generator. Strictly sequential (one TPU process).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== featurenet (self-supervised perceptual backbone) ==="
python -m ml_super_resolution_tpu.cli featurenet --workdir runs/r2_featurenet \
  --steps 4000 --batch-size 32 > runs/r2_featurenet.log 2>&1
tail -2 runs/r2_featurenet.log

echo "=== srgan x4 adversarial phase (g-init from converged srresnet) ==="
python -m ml_super_resolution_tpu.cli train --model srgan --scale 4 \
  --steps 12000 --g-init runs/r2_srresnet_x4 \
  --feature-net runs/r2_featurenet \
  --eval-every 1000 --ckpt-every 3000 --log-every 100 \
  --workdir runs/r2_srgan_x4 > runs/r2_srgan_x4.log 2>&1
tail -2 runs/r2_srgan_x4.log
echo "QUEUE3 DONE"
