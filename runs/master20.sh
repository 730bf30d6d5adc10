#!/bin/bash
# Round-4 queue #1 (ONE chip queue at a time — CLAUDE.md hazard 2):
#   0. health gate
#   1. on-chip SRX1 artifact load/call vs direct checkpoint inference
#      (VERDICT r3 missing #2; the artifact was exported CHIPLESS on cpu)
#   2. MFU lane-occupancy probes (VERDICT r3 weak #2/#3)
#   3. full paper EDSR (32x256) chunked 1.5k -> 100k (VERDICT r3 missing #3)
#   4. final evals on the converged full EDSR (plain + D4 ensemble)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== master20 start ($(date -u +%H:%M)) ==="
chip_health 20 || { echo "CHIP NEVER RECOVERED ($(date -u +%H:%M))"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== on-chip SRX1 artifact check ($(date -u +%H:%M)) ==="
with_chip timeout 1500 python - > runs/aot_chip_check.out 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/espcn_x4.srx")
print("header:", {k: hdr[k] for k in ("model", "scale", "batches", "step")})
x = (np.random.default_rng(0).random((1, 270, 480, 3)) * 255).astype(np.uint8)
out = fn(x)  # exported tpu program, batch-1 bucket
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
# direct checkpoint inference through the live model code, same pipeline
from ml_super_resolution_tpu.cli import _load_run
from ml_super_resolution_tpu.infer import upscale_frames
trainer, state, step, cfg = _load_run("runs/r3_espcn_x4", best=True)
variables = {"params": trainer.eval_params(state)}
if getattr(state, "batch_stats", None):
    variables["batch_stats"] = state.batch_stats
ref = np.asarray(upscale_frames(trainer.model, variables, jnp.asarray(x),
                                "espcn", 4))
diff = int(np.abs(out.astype(int) - ref.astype(int)).max())
print("max |artifact - direct ckpt inference| =", diff, "uint8 steps")
assert diff <= 1, diff
print("AOT CHIP CHECK PASS")
EOF
echo "aot check rc=$? ($(date -u +%H:%M))"
tail -3 runs/aot_chip_check.out

echo "=== MFU probes ($(date -u +%H:%M)) ==="
with_chip timeout 2400 python tools/probe_mfu.py \
  > runs/probe_mfu.out 2> runs/probe_mfu.err
echo "probe_mfu rc=$? ($(date -u +%H:%M))"
grep '^#' runs/probe_mfu.err

echo "=== full EDSR (32x256) to 100k ($(date -u +%H:%M)) ==="
for tgt in 10000 20000 30000 40000 50000 60000 70000 80000 90000 100000; do
  with_chip_wd 420 runs/r3_edsr_full/metrics.jsonl timeout 1800 \
    python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
    --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
    --lr-decay-steps 20000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 5000 \
    --steps "$tgt" --workdir runs/r3_edsr_full >> runs/r3_edsr_full.log 2>&1
  rc=$?
  tail -1 runs/r3_edsr_full.log
  if [ "$rc" -ne 0 ]; then
    echo "chunk to $tgt rc=$rc; health-gating before next ($(date -u +%H:%M))"
    chip_health 15 || { echo "CHIP LOST mid-train ($(date -u +%H:%M))"; break; }
  fi
done

echo "=== full EDSR final evals ($(date -u +%H:%M)) ==="
with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_full --best \
  > runs/eval_edsr_full.json 2> runs/eval_edsr_full.err
tail -1 runs/eval_edsr_full.json
with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_edsr_full --best --ensemble \
  > runs/ens_edsr_full.json 2> runs/ens_edsr_full.err
tail -1 runs/ens_edsr_full.json

echo "MASTER20 DONE ($(date -u +%H:%M))"
