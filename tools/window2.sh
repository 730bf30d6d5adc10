#!/bin/bash
# Post-queue chip window: vdsr per-scale eval, fused-kernel probe, bench
# preview.  60s spacing between chip processes — claiming the chip during
# another process's attach teardown futex-waits forever (measured).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

poll() {
  for i in 1 2 3 4 5 6 7 8; do
    if timeout 120 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"; then
      sleep 60; return 0
    fi
    echo "chip busy (poll $i); waiting 150s"; sleep 150
  done
  return 1
}

echo "=== window2 start ($(date -u +%H:%M)) ==="
sleep 60
poll

echo "=== vdsr multiscale per-scale eval ==="
timeout 900 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r2_vdsr_ms --scales 2,3,4 2>&1 | tail -3
sleep 60
poll

echo "=== fused-kernel probe (vdsr fused + espcn v2 + bf16 bars) ==="
timeout 1500 python tools/chip_probes.py vdsrfused 2>&1 | tee runs/vdsr_probe2.log
sleep 60
poll

echo "=== bench preview ==="
timeout 2400 python bench.py > runs/bench_preview.json 2> runs/bench_preview.err
tail -3 runs/bench_preview.err
cat runs/bench_preview.json
echo "WINDOW2 DONE ($(date -u +%H:%M))"
