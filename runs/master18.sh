#!/bin/bash
# End-game schedule: probes at ~06:55 and ~07:40; on recovery run ONLY the
# quick unique-value items (int8 chip eval, SRX artifact chip check, then
# a bench preview if and only if it can finish by 08:30).  ALL chip
# activity ends by 08:30 so the driver's end-of-round bench finds a free
# relay.  EDSR-full training moves to round 4 (NEXT.md item 2).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

probe () {
  with_chip timeout 600 python -c \
    "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"
}

ok=0
for at in "06:55" "07:40"; do
  now=$(date -u +%s); tgt=$(date -u -d "2026-08-18 $at" +%s)
  [ "$tgt" -gt "$now" ] && sleep $((tgt - now))
  echo "=== probe ($(date -u +%H:%M)) ==="
  if probe; then ok=1; break; fi
  echo "probe failed ($(date -u +%H:%M))"
done
[ "$ok" -ne 1 ] && { echo "NO RECOVERY ($(date -u +%H:%M)); relay left quiet"; exit 1; }

echo "=== RELAY BACK ($(date -u +%H:%M)); quick payload ==="
with_chip timeout 900 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r3_espcn_x4 --best --int8 \
  > runs/int8_espcn_chip.json 2> runs/int8_espcn_chip.err
tail -1 runs/int8_espcn_chip.json
with_chip timeout 600 python -m ml_super_resolution_tpu.cli export \
  --workdir runs/r3_espcn_x4 --best --output runs/espcn_x4.srx \
  --size 270x480 --batches 1,8 > runs/aot_export.json 2> runs/aot_export.err
tail -1 runs/aot_export.json
with_chip timeout 900 python - > runs/aot_chip_check.out 2>&1 <<'EOF'
import numpy as np, jax
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/espcn_x4.srx")
x = (np.random.default_rng(0).random((8, 270, 480, 3)) * 255).astype(np.uint8)
out = fn(x)
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
EOF
tail -2 runs/aot_chip_check.out

# bench preview only if it can finish by 08:30
if [ "$(date -u +%s)" -lt "$(date -u -d '2026-08-18 07:50' +%s)" ]; then
  echo "=== bench preview ($(date -u +%H:%M)) ==="
  with_chip timeout 2200 python bench.py \
    > runs/bench_r3_final.out 2> runs/bench_r3_final.err
  head -1 runs/bench_r3_final.out
  tail -1 runs/bench_r3_final.out
else
  echo "skipping bench preview (driver bench window protection)"
fi
echo "MASTER18 DONE ($(date -u +%H:%M))"
