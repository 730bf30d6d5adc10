#!/bin/bash
# Round-3 closing chip window (after master9):
#   1. ESPCN bf16 batch-scaling probe b48/b64 (headline headroom check)
#   2. On-chip D4 self-ensemble evals (EDSR+ protocol) for the quality table
#   3. Final full bench.py run (driver-evidence preview)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

M9=$(cat /tmp/master9.pid 2>/dev/null || echo 0)
while [ "$M9" -gt 0 ] && kill -0 "$M9" 2>/dev/null; do sleep 30; done
echo "=== master9 done; master10 starting ($(date -u +%H:%M)) ==="

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

echo "MASTER10 DONE ($(date -u +%H:%M))"
