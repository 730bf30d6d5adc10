#!/bin/bash
# Round-3 master queue: retrain the full quality table on the v2 synthetic
# set (datasets.py SyntheticImages version=2 — dense sharp structure so the
# x4 eval can rank models again; VERDICT r2 weak #5/#6), plus the
# D-balanced SRGAN adversarial phase.
#
# Every chip-touching command goes through tools/chiplock.sh::with_chip
# (flock + teardown gap) so interactive probes can interleave between
# chunks.  Chunked restarts remain the workaround for the relay client's
# per-byte host-RAM leak (CLAUDE.md 5b).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -d "+9 hours" +%s)}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }

guard() {
  if past_deadline; then
    echo "DEADLINE reached before $1 — stopping queue"; exit 0
  fi
  echo "=== $1 ($(date -u +%H:%M)) ==="
}

chipwait() {
  for i in 1 2 3 4 5 6 7 8; do
    if with_chip timeout 120 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"; then
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
    with_chip timeout "$to" python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "runs/${label}.log" 2>&1
    local rc=$?
    tail -1 "runs/${label}.log"
    if [ "$rc" -ge 124 ]; then chipwait "$label"; fi
    tgt=$((tgt + chunk))
  done
}

chipwait "queue start"

guard "srcnn x2, to 12k"
train_chunked r3_srcnn_x2 runs/r3_srcnn_x2 6000 12000 2400 \
  --model srcnn --scale 2 --device-data --steps-per-call 8 \
  --lr-decay-steps 5000 --lr-decay-rate 0.3 \
  --eval-every 1500 --ckpt-every 3000

guard "espcn x2, to 20k"
train_chunked r3_espcn_x2 runs/r3_espcn_x2 10000 20000 3000 \
  --model espcn --scale 2 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 2000 --ckpt-every 5000

guard "espcn x3, to 20k"
train_chunked r3_espcn_x3 runs/r3_espcn_x3 10000 20000 3000 \
  --model espcn --scale 3 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 2000 --ckpt-every 5000

guard "espcn x4, to 20k"
train_chunked r3_espcn_x4 runs/r3_espcn_x4 10000 20000 3000 \
  --model espcn --scale 4 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 2000 --ckpt-every 5000

guard "vdsr multiscale joint, to 30k"
train_chunked r3_vdsr_ms runs/r3_vdsr_ms 10000 30000 3300 \
  --model vdsr --scale 3 --multi-scale --device-data --steps-per-call 8 \
  --lr-decay-steps 10000 --lr-decay-rate 0.3 \
  --eval-every 3000 --ckpt-every 5000

guard "srresnet x4 (MSE), to 20k"
train_chunked r3_srresnet_x4 runs/r3_srresnet_x4 10000 20000 3300 \
  --model srresnet --scale 4 --device-data --steps-per-call 8 \
  --lr-decay-steps 8000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 5000

guard "edsr x4 (L1, paper geometry 16x48^2 LR), to 20k"
train_chunked r3_edsr_x4 runs/r3_edsr_x4 10000 20000 3300 \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --lr-decay-steps 10000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 5000

guard "featurenet (v2 data)"
with_chip timeout 2400 python -m ml_super_resolution_tpu.cli featurenet \
  --workdir runs/r3_featurenet --steps 2500 --batch-size 32 \
  > runs/r3_featurenet.log 2>&1
tail -2 runs/r3_featurenet.log

guard "srgan x4 adversarial (D-balanced), to 10k"
train_chunked r3_srgan_x4 runs/r3_srgan_x4 5000 10000 3300 \
  --model srgan --scale 4 --g-init runs/r3_srresnet_x4 \
  --feature-net runs/r3_featurenet --device-data --steps-per-call 8 \
  --d-lr-scale 0.1 --label-smooth 0.1 \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

echo "MASTER6 DONE ($(date -u +%H:%M))"
