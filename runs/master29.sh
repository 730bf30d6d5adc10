#!/bin/bash
# Round-5 queue #3 (master28 was cut after its bench preview by the session
# restart at ~11:30; deadlines rewritten for the 23:45->04:55 window).
# Order banks VERDICT-r4 #3 (flagship production legs) BEFORE the open-ended
# training filler so a wedge cannot cost the required rows:
#   1. re-validate the composed/packed bench rows (24c5517 changed the
#      strip batching AFTER the 10:52 preview measured them)
#   2. chipless CPU export of the EDSR-full SRX1 artifact
#   3. on-chip artifact check vs direct ckpt inference
#   4. EDSR-full int8 and int8+D4 quality rows (chip)
#   5. EDSR-full training filler, 4500-step chunks until 03:05 (VERDICT #4)
#   6. final eval refresh: plain + D4 + int8 + featnet on the new best
#   7. chip quiet + healthy from ~04:15 for the driver bench
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

TRAIN_BY=$(date -u -d '2026-08-21 03:05' +%s)
EVAL_BY=$(date -u -d '2026-08-21 04:15' +%s)

latest_step() {
  ls "$1/ckpts" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 || true
}

train_until() {
  local by=$1 guard=$2 tmo=$3 wd=$4 inc=$5 maxs=$6; shift 6
  local strikes=0
  while :; do
    local cur; cur=$(latest_step "$wd"); cur=${cur:-0}
    [ "$cur" -ge "$maxs" ] && { echo "$wd: reached $cur >= $maxs"; break; }
    local now; now=$(date -u +%s)
    [ $((now + guard)) -ge "$by" ] && { echo "$wd: deadline, stop at $cur ($(date -u +%H:%M))"; break; }
    local tgt=$((cur + inc)); [ "$tgt" -gt "$maxs" ] && tgt=$maxs
    with_chip_wd 420 "$wd/metrics.jsonl" timeout "$tmo" \
      python -m ml_super_resolution_tpu.cli train "$@" \
      --steps "$tgt" --workdir "$wd" >> "$wd.log" 2>&1
    local rc=$?
    local newcur; newcur=$(latest_step "$wd"); newcur=${newcur:-0}
    echo "$wd: chunk -> $tgt rc=$rc now=$newcur ($(date -u +%H:%M))"
    if [ "$newcur" -le "$cur" ]; then
      strikes=$((strikes + 1))
      [ "$strikes" -ge 3 ] && { echo "$wd: 3 no-progress chunks, aborting phase"; return 1; }
    else
      strikes=0
    fi
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
      chip_health 6 || { echo "CHIP LOST in $wd"; return 1; }
    fi
  done
}

echo "=== master29 start ($(date -u +%H:%M)) ==="
# 00:14-00:51: three 300s-budget probes hung and were SIGTERMed — each kill
# of a mid-claim probe is itself a wedge event (chiplock.sh cadence note).
# One long-budget probe instead: if cold attach after the machine restore
# simply takes minutes, this succeeds where the 300s cadence never can.
chip_health 4 1200 600 || { echo "chip unavailable at queue start"; exit 1; }

echo "=== re-validate composed rows post-24c5517 ($(date -u +%H:%M)) ==="
with_chip timeout 900 python - 2> runs/bench_r5_preview2.err <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
import bench
bench.bench_edsr_composed()
PYEOF
echo "preview2 rc=$? ($(date -u +%H:%M))"
grep '^#' runs/bench_r5_preview2.err
# (CPU SRX1 export of the flagship runs standalone outside this queue —
# host-only, banked before the chip gate even opens.)

echo "=== on-chip EDSR-full artifact check ($(date -u +%H:%M)) ==="
with_chip timeout 1800 python - > runs/aot_chip_check_edsr_full.out 2>&1 <<'PYEOF'
import numpy as np, jax, jax.numpy as jnp
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/edsr_full_x4.srx")
print("header:", {k: hdr[k] for k in ("model", "scale", "batches", "step")})
x = (np.random.default_rng(0).random((1, 270, 480, 3)) * 255).astype(np.uint8)
out = fn(x)
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
from ml_super_resolution_tpu.cli import _load_run
from ml_super_resolution_tpu.infer import upscale_frames
trainer, state, step, cfg = _load_run("runs/r4_edsr_full", best=True)
variables = {"params": trainer.eval_params(state)}
if getattr(state, "batch_stats", None):
    variables["batch_stats"] = state.batch_stats
ref = np.asarray(upscale_frames(trainer.model, variables, jnp.asarray(x),
                                "edsr", 4))
diff = int(np.abs(out.astype(int) - ref.astype(int)).max())
print("max |artifact - direct ckpt inference| =", diff, "uint8 steps")
assert diff <= 1, diff
print("AOT CHIP CHECK PASS (edsr-full)")
PYEOF
echo "aot check rc=$? ($(date -u +%H:%M))"
tail -3 runs/aot_chip_check_edsr_full.out

echo "=== EDSR-full int8 quality row, banked early ($(date -u +%H:%M)) ==="
with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best --int8 \
  > runs/int8_edsr_full_r5.json 2> runs/int8_edsr_full_r5.err
echo "int8: rc=$? $(tail -1 runs/int8_edsr_full_r5.json)"

echo "=== EDSR-full int8+D4 row, banked early ($(date -u +%H:%M)) ==="
with_chip timeout 2100 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best --int8 --ensemble \
  > runs/i8ens_edsr_full_r5.json 2> runs/i8ens_edsr_full_r5.err
echo "i8ens: rc=$? $(tail -1 runs/i8ens_edsr_full_r5.json)"

echo "=== EDSR-full training filler until $(date -u -d @$TRAIN_BY +%H:%M) ==="
train_until "$TRAIN_BY" 800 1100 runs/r4_edsr_full 4500 100000 \
  --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
  --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
  --lr-decay-steps 20000 --lr-decay-rate 0.5 \
  --eval-every 2000 --ckpt-every 2500

echo "=== final EDSR-full eval refresh ($(date -u +%H:%M)) ==="
with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best \
  > runs/eval_edsr_full_r5.json 2> runs/eval_edsr_full_r5.err
echo "plain: $(tail -1 runs/eval_edsr_full_r5.json)"
if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
  with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best --ensemble \
    > runs/ens_edsr_full_r5.json 2> runs/ens_edsr_full_r5.err
  echo "ens: $(tail -1 runs/ens_edsr_full_r5.json)"
fi
if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
  with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best --int8 \
    > runs/int8_edsr_full_r5b.json 2> runs/int8_edsr_full_r5b.err
  echo "int8-final: $(tail -1 runs/int8_edsr_full_r5b.json)"
fi
if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
  with_chip timeout 900 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best --perceptual runs/r3_featurenet \
    > runs/percep_edsr_full_r5.json 2> runs/percep_edsr_full_r5.err
  echo "featnet: $(tail -1 runs/percep_edsr_full_r5.json)"
fi

echo "=== final chip health ($(date -u +%H:%M)) ==="
chip_health 3 && echo "chip healthy at close" || echo "WARNING: health probe failed"
echo "MASTER29 DONE ($(date -u +%H:%M)) — chip QUIET from here (driver bench next)"
