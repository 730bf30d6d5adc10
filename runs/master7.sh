#!/bin/bash
# Round-3 post-queue chip work (runs after master6 exits):
#  1. full bench.py (validates every row + the headline BENCH_r03 parses)
#  2. ESPCN bf16 batch-scaling probe (b16/b32 — headline headroom check)
#  3. EDSR x4 extension +20k (it was still climbing at 20k)
#  4. full-EDSR (32x256) short smoke — proves the paper-size model trains
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

# wait for master6 (poll its pid)
M6=$(cat /tmp/master6.pid 2>/dev/null || echo 0)
while [ "$M6" -gt 0 ] && kill -0 "$M6" 2>/dev/null; do sleep 60; done
echo "=== master6 done; master7 starting ($(date -u +%H:%M)) ==="

echo "=== full bench ($(date -u +%H:%M)) ==="
with_chip timeout 2400 python bench.py > runs/bench_r3_preview.json 2> runs/bench_r3_preview.err
tail -1 runs/bench_r3_preview.json
grep -c "MP/s" runs/bench_r3_preview.err || true

echo "=== espcn bf16 batch scaling probe ($(date -u +%H:%M)) ==="
with_chip timeout 900 python - <<'EOF' >> runs/espcn_batch_probe.log 2>&1
import numpy as np
import jax.numpy as jnp
import bench
for nb in (8, 16, 32):
    try:
        mps, dt = bench.bench_model_mps("espcn", 4, (1080, 1920), batch=nb,
                                        channels=1,
                                        overrides={"dtype": jnp.bfloat16},
                                        iters=max(4, 20 // (nb // 8)))
        print(f"espcn-bf16 b{nb}: {mps:.1f} MP/s ({dt*1e3:.2f} ms/batch)",
              flush=True)
    except Exception as e:
        print(f"b{nb} failed: {e}", flush=True)
EOF
tail -4 runs/espcn_batch_probe.log

echo "=== edsr x4 extension to 40k ($(date -u +%H:%M)) ==="
for tgt in 30000 40000; do
  with_chip timeout 3300 python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
    --lr-decay-steps 10000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r3_edsr_x4 >> runs/r3_edsr_x4.log 2>&1
  tail -1 runs/r3_edsr_x4.log
done

echo "=== full EDSR (32x256) smoke 1500 steps ($(date -u +%H:%M)) ==="
with_chip timeout 3000 python -m ml_super_resolution_tpu.cli train \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
  --eval-every 500 --ckpt-every 1500 \
  --steps 1500 --workdir runs/r3_edsr_full > runs/r3_edsr_full.log 2>&1
tail -2 runs/r3_edsr_full.log

echo "MASTER7 DONE ($(date -u +%H:%M))"
