#!/bin/bash
# Round-3 closing chip window, take 2 (after the 20:17 relay wedge +
# PID-kill of the stuck edsr chunk):
#   0. health-gate: tiny on-chip op under timeout until the relay answers
#   1. ESPCN bf16 batch probe b48/b64
#   2. on-chip D4 self-ensemble evals (quality table rows)
#   3. final full bench.py
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== health gate ($(date -u +%H:%M)) ==="
for i in $(seq 1 20); do
  if with_chip timeout 60 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" 2>/dev/null; then
    echo "healthy after attempt $i ($(date -u +%H:%M))"
    break
  fi
  echo "attempt $i: not ready ($(date -u +%H:%M))"
  sleep 90
done

echo "=== espcn bf16 batch probe b48/b64 ($(date -u +%H:%M)) ==="
with_chip timeout 900 python - <<'EOF' >> runs/espcn_batch_probe.log 2>&1
import jax.numpy as jnp
import bench
for nb in (48, 64):
    try:
        mps, dt = bench.bench_model_mps("espcn", 4, (1080, 1920), batch=nb,
                                        channels=1,
                                        overrides={"dtype": jnp.bfloat16},
                                        iters=4)
        print(f"espcn-bf16 b{nb}: {mps:.1f} MP/s ({dt*1e3:.2f} ms/batch)",
              flush=True)
    except Exception as e:
        print(f"b{nb} failed: {e}", flush=True)
EOF
tail -2 runs/espcn_batch_probe.log

echo "=== on-chip ensemble evals ($(date -u +%H:%M)) ==="
with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_vdsr_ms --best --scales 2,3,4 --ensemble \
  > runs/ens_vdsr.json 2>runs/ens_vdsr.err
tail -1 runs/ens_vdsr.json
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_x4 --best --ensemble \
  > runs/ens_edsr.json 2>runs/ens_edsr.err
tail -1 runs/ens_edsr.json
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_srresnet_x4 --best --ensemble \
  > runs/ens_srresnet.json 2>runs/ens_srresnet.err
tail -1 runs/ens_srresnet.json
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_srgan_x4 --best --ensemble \
  > runs/ens_srgan.json 2>runs/ens_srgan.err
tail -1 runs/ens_srgan.json
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_srcnn_x2 --best --ensemble \
  > runs/ens_srcnn.json 2>runs/ens_srcnn.err
tail -1 runs/ens_srcnn.json

echo "=== final full bench ($(date -u +%H:%M)) ==="
with_chip timeout 3000 python bench.py \
  > runs/bench_r3_final.out 2> runs/bench_r3_final.err
head -1 runs/bench_r3_final.out
tail -1 runs/bench_r3_final.out

echo "MASTER11 DONE ($(date -u +%H:%M))"
