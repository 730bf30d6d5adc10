#!/bin/bash
# Session-4 supervised payload: run ONLY after a successful chip probe.
# Quick unique-value items (int8 chip eval, SRX artifact chip check, one
# EDSR-full training chunk if time allows).  Every item bounded; nothing
# orphaned — this script is launched and watched inside the session.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== payload start ($(date -u +%H:%M)) ==="
with_chip timeout 900 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_espcn_x4 --best --int8 \
  > runs/int8_espcn_chip.json 2> runs/int8_espcn_chip.err
echo "int8 eval rc=$? ($(date -u +%H:%M))"
tail -1 runs/int8_espcn_chip.json 2>/dev/null

with_chip timeout 600 python -m ml_super_resolution_tpu.cli export \
  --workdir runs/r3_espcn_x4 --best --output runs/espcn_x4.srx \
  --size 270x480 --batches 1,8 > runs/aot_export.json 2> runs/aot_export.err
echo "export rc=$? ($(date -u +%H:%M))"

with_chip timeout 900 python - > runs/aot_chip_check.out 2>&1 <<'EOF'
import numpy as np, jax
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/espcn_x4.srx")
x = (np.random.default_rng(0).random((8, 270, 480, 3)) * 255).astype(np.uint8)
out = fn(x)
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
EOF
echo "aot check rc=$? ($(date -u +%H:%M))"
tail -2 runs/aot_chip_check.out
echo "=== payload done ($(date -u +%H:%M)) ==="
