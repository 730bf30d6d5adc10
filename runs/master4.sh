#!/bin/bash
# Round-2 master queue v4: chunked + multi-step dispatch (--steps-per-call 8).
#
# The axon relay client leaks host memory per step (~1 MB/step measured;
# kernel-time page churn decays step rate 6.7 -> 0.3 steps/s within 2k
# steps).  Our loop is leak-free on the CPU backend (flat RSS over 3k
# steps), so the workaround is process recycling: every run is restarted
# in --steps increments and auto-resumes from its latest Orbax checkpoint,
# clearing the leak each chunk.  Clean exits don't wedge the relay.
#
# Strictly sequential (one TPU process at a time); deadline-guarded so the
# chip is free before the driver's end-of-round bench.
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

chipwait() {  # poll until the chip answers (wedge recovery), max ~15 min
  for i in 1 2 3 4 5 6; do
    if timeout 120 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"; then
      # the poll's own attach must fully release before the next claimant
      # starts: a claim attempted during teardown futex-waits FOREVER
      # (it is not woken on release — measured 16-Aug)
      sleep 30
      return 0
    fi
    echo "chip busy/wedged (poll $i); waiting 150s"; sleep 150
  done
  echo "chip still unavailable after 15 min"
  return 1
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
guard "srresnet x4 (MSE), chunked to 20k"
train_chunked r2_srresnet_x4 runs/r2_srresnet_x4 8000 24000 3600 \
  --model srresnet --scale 4 --lr-decay-steps 8000 --lr-decay-rate 0.3 \
  --eval-every 2000 --ckpt-every 4000 --steps-per-call 8

if [ -f runs/ALLOW_VDSR_PROBE ]; then
  guard "fused-kernel on-device probe (gated)"
  timeout 1500 python tools/chip_probes.py vdsrfused 2>&1 | tee runs/vdsr_probe.log
  chipwait "post-probe"
fi

guard "featurenet"
timeout 2400 python -m ml_super_resolution_tpu.cli featurenet \
  --workdir runs/r2_featurenet --steps 4000 --batch-size 32 \
  > runs/r2_featurenet.log 2>&1
tail -2 runs/r2_featurenet.log

guard "srgan x4 adversarial, chunked to 10k"
train_chunked r2_srgan_x4 runs/r2_srgan_x4 5000 10000 3600 \
  --model srgan --scale 4 --g-init runs/r2_srresnet_x4 \
  --feature-net runs/r2_featurenet --steps-per-call 8 \
  --eval-every 1000 --ckpt-every 2500 --log-every 100

guard "vdsr multiscale joint, chunked to 30k"
train_chunked r2_vdsr_ms runs/r2_vdsr_ms 10000 40000 3600 \
  --model vdsr --scale 3 --multi-scale \
  --lr-decay-steps 10000 --lr-decay-rate 0.3 \
  --eval-every 2500 --ckpt-every 5000 --steps-per-call 8

guard "espcn x2 converged, chunked to 20k"
train_chunked r2_espcn_x2 runs/r2_espcn_x2 10000 20000 3000 \
  --model espcn --scale 2 --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 --steps-per-call 8

guard "espcn x4 converged, chunked to 20k"
train_chunked r2_espcn_x4 runs/r2_espcn_x4 10000 20000 3000 \
  --model espcn --scale 4 --lr-decay-steps 8000 --lr-decay-rate 0.25 \
  --eval-every 1000 --ckpt-every 5000 --steps-per-call 8

echo "MASTER3 DONE ($(date -u +%H:%M))"
