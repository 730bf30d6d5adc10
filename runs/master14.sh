#!/bin/bash
# Post-master12 window: on-chip validation of the session-3 features.
#   1. int8 PTQ quality deltas on trained checkpoints (RESULTS rows)
#   2. AOT SRX1 artifact: export (chipless) + on-chip load/call check
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

for pidfile in /tmp/master12.pid /tmp/master13.pid; do
  P=$(cat "$pidfile" 2>/dev/null || echo 0)
  while [ "$P" -gt 0 ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
done
echo "=== master12/13 done; master14 starting ($(date -u +%H:%M)) ==="
chip_health 10 || { echo "chip not available for master14"; exit 1; }

echo "=== int8 on-chip quality evals ($(date -u +%H:%M)) ==="
i8 () {  # i8 <workdir> <tag> [extra...]
  local wd=$1 tag=$2; shift 2
  with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
    --workdir "$wd" --best --int8 "$@" \
    > "runs/int8_${tag}.json" 2> "runs/int8_${tag}.err"
  tail -1 "runs/int8_${tag}.json"
}
i8 runs/r3_espcn_x4    espcn_x4
i8 runs/r3_srcnn_x2    srcnn_x2
i8 runs/r3_vdsr_ms     vdsr --scales 2,3,4
i8 runs/r3_edsr_x4     edsr_x4
i8 runs/r3_srresnet_x4 srresnet_x4

echo "=== AOT artifact on-chip check ($(date -u +%H:%M)) ==="
with_chip timeout 900 python -m ml_super_resolution_tpu.cli export \
  --workdir runs/r3_espcn_x4 --best --output runs/espcn_x4.srx \
  --size 270x480 --batches 1,8 > runs/aot_export.json 2> runs/aot_export.err
tail -1 runs/aot_export.json
with_chip timeout 900 python - > runs/aot_chip_check.out 2>&1 <<'EOF'
import numpy as np, time
import jax
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/espcn_x4.srx")
x = (np.random.default_rng(0).random((8, 270, 480, 3)) * 255).astype(np.uint8)
out = fn(x)  # platform check vs the axon relay's PJRT platform
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
t0 = time.perf_counter(); fn(x); dt = time.perf_counter() - t0
print(f"warm artifact call wall: {dt*1e3:.1f} ms (incl. relay readback)")
EOF
tail -2 runs/aot_chip_check.out

echo "MASTER14 DONE ($(date -u +%H:%M))"
