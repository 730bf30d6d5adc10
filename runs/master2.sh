#!/bin/bash
# Round-2 master training queue: every remaining converged run, strictly
# sequential (one TPU process at a time, CLAUDE.md hazard #2), each stage
# timeout-bounded, with a wall-clock deadline guard so the chip is free
# before the driver's end-of-round bench.
#
# Stage order puts the SRGAN critical path first (srresnet -> featurenet ->
# srgan), then the VDSR long run, then the optional ESPCN extra scales.
# Between srgan and vdsr there is a gated on-device probe slot for the
# fused VDSR kernel (created only once it is AOT-clean).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
DEADLINE_EPOCH=$(date -d "06:30" +%s)   # leave >1h margin before round end
if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
  DEADLINE_EPOCH=$(date -d "tomorrow 06:30" +%s)
fi

guard() {  # guard <label>: skip remaining stages when past the deadline
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "DEADLINE reached before stage $1 — stopping queue"; exit 0
  fi
  echo "=== $1 ($(date -u +%H:%M)) ==="
}

chipok() {
  timeout 60 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || {
    echo "chip poll failed before $1; waiting 10 min"; sleep 600; }
}

guard "srresnet x4 (MSE) long"
timeout 9000 python -m ml_super_resolution_tpu.cli train --model srresnet --scale 4 \
  --steps 40000 --lr-decay-steps 15000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 5000 \
  --workdir runs/r2_srresnet_x4 > runs/r2_srresnet_x4.log 2>&1
tail -2 runs/r2_srresnet_x4.log

guard "featurenet"
timeout 2400 python -m ml_super_resolution_tpu.cli featurenet \
  --workdir runs/r2_featurenet --steps 4000 --batch-size 32 \
  > runs/r2_featurenet.log 2>&1
tail -2 runs/r2_featurenet.log

guard "srgan x4 adversarial (g-init from srresnet)"
timeout 9000 python -m ml_super_resolution_tpu.cli train --model srgan --scale 4 \
  --steps 12000 --g-init runs/r2_srresnet_x4 \
  --feature-net runs/r2_featurenet \
  --eval-every 1000 --ckpt-every 3000 --log-every 100 \
  --workdir runs/r2_srgan_x4 > runs/r2_srgan_x4.log 2>&1
tail -2 runs/r2_srgan_x4.log

if [ -f runs/ALLOW_VDSR_PROBE ]; then
  guard "vdsr fused kernel on-device probe (gated)"
  chipok "vdsr probe"
  timeout 900 python tools/chip_probes.py vdsrfused 2>&1 | tee runs/vdsr_probe.log
  chipok "post vdsr probe"
fi

guard "vdsr multiscale joint x2/x3/x4 long"
timeout 10000 python -m ml_super_resolution_tpu.cli train --model vdsr --scale 3 --multi-scale \
  --steps 40000 --lr-decay-steps 12000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 5000 \
  --workdir runs/r2_vdsr_ms > runs/r2_vdsr_ms.log 2>&1
tail -2 runs/r2_vdsr_ms.log

guard "espcn x2 converged"
timeout 7200 python -m ml_super_resolution_tpu.cli train --model espcn --scale 2 \
  --steps 25000 --lr-decay-steps 10000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 \
  --workdir runs/r2_espcn_x2 > runs/r2_espcn_x2.log 2>&1
tail -2 runs/r2_espcn_x2.log

guard "espcn x4 converged"
timeout 7200 python -m ml_super_resolution_tpu.cli train --model espcn --scale 4 \
  --steps 25000 --lr-decay-steps 10000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 \
  --workdir runs/r2_espcn_x4 > runs/r2_espcn_x4.log 2>&1
tail -2 runs/r2_espcn_x4.log

echo "MASTER2 DONE ($(date -u +%H:%M))"
