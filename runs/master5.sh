#!/bin/bash
# Round-2 master queue v5: device-resident dataset + multi-step dispatch.
#
# Root cause of v3/v4 slowness: the attach relay client leaks host RAM
# roughly per byte transferred (~7 MB/step at batch 64 x 192px tiles),
# degrading 5 -> 0.5 steps/s within a few thousand steps.  --device-data
# stages the whole synthetic corpus on the device once and samples tiles
# with the device PRNG inside the jitted step, so steady-state host->device
# traffic is ZERO; --steps-per-call 8 also amortizes dispatch latency.
# Chunking (generous) is retained as insurance, with auto-resume.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
DEADLINE_EPOCH=$(date -d "06:30" +%s)
if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
  DEADLINE_EPOCH=$(date -d "tomorrow 06:30" +%s)
fi

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }

guard() {
  if past_deadline; then
    echo "DEADLINE reached before $1 — stopping queue"; exit 0
  fi
  echo "=== $1 ($(date -u +%H:%M)) ==="
}

chipwait() {
  for i in 1 2 3 4 5 6 7 8; do
    if timeout 120 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"; then
      sleep 30   # let the poll's attach fully release (claim race = forever-futex)
      return 0
    fi
    echo "chip busy/wedged (poll $i); waiting 150s"; sleep 150
  done
  echo "chip still unavailable"; return 1
}

train_chunked() {  # train_chunked <label> <workdir> <chunk> <total> <timeout> <args...>
  local label="$1" wd="$2" chunk="$3" total="$4" to="$5"; shift 5
  local tgt=$chunk
  while [ "$tgt" -le "$total" ]; do
    if past_deadline; then echo "DEADLINE mid-$label"; return 0; fi
    echo "--- $label -> step $tgt ($(date -u +%H:%M)) ---"
    timeout "$to" python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "runs/${label}.log" 2>&1
    local rc=$?
    tail -1 "runs/${label}.log"
    if [ "$rc" -ge 124 ]; then chipwait "$label"; fi
    tgt=$((tgt + chunk))
  done
}

chipwait "queue start"

guard "srresnet x4 (MSE), device-data, to 20k"
train_chunked r2_srresnet_x4 runs/r2_srresnet_x4 10000 20000 3300 \
  --model srresnet --scale 4 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 2000

guard "featurenet"
timeout 2400 python -m ml_super_resolution_tpu.cli featurenet \
  --workdir runs/r2_featurenet --steps 2500 --batch-size 32 \
  > runs/r2_featurenet.log 2>&1
tail -2 runs/r2_featurenet.log

guard "srgan x4 adversarial, to 10k"
train_chunked r2_srgan_x4 runs/r2_srgan_x4 5000 10000 3300 \
  --model srgan --scale 4 --g-init runs/r2_srresnet_x4 \
  --feature-net runs/r2_featurenet --device-data --steps-per-call 8 \
  --eval-every 1000 --ckpt-every 2000 --log-every 100

if [ -f runs/ALLOW_VDSR_PROBE ]; then
  guard "fused-kernel on-device probe (gated)"
  timeout 1500 python tools/chip_probes.py vdsrfused 2>&1 | tee runs/vdsr_probe.log
  chipwait "post-probe"
fi

guard "vdsr multiscale joint, device-data, to 30k"
train_chunked r2_vdsr_ms runs/r2_vdsr_ms 15000 30000 3300 \
  --model vdsr --scale 3 --multi-scale --device-data --steps-per-call 8 \
  --lr-decay-steps 10000 --lr-decay-rate 0.3 \
  --eval-every 2500 --ckpt-every 2500

guard "espcn x2 converged, device-data, to 20k"
train_chunked r2_espcn_x2 runs/r2_espcn_x2 10000 20000 3000 \
  --model espcn --scale 2 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 2500

guard "espcn x4 converged, device-data, to 20k"
train_chunked r2_espcn_x4 runs/r2_espcn_x4 10000 20000 3000 \
  --model espcn --scale 4 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 2500

echo "MASTER5 DONE ($(date -u +%H:%M))"
