#!/bin/bash
# Round-5 filler #2.  master29's filler could not survive today's relay:
# attach+upload+compile of the 43M trainer exceeded the 420 s watchdog
# twice, and each SIGTERM re-wedged the relay while the inter-chunk
# chip_health used 300 s probes that a ~13-min cold attach can never pass.
# Fixes here: 900 s watchdog, 1500 s chunk timeout, long-budget (1200 s)
# health probes, train until 03:30, final refresh gated on the best ckpt
# actually changing, chip quiet by ~04:10 for the driver bench.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

TRAIN_BY=$(date -u -d '2026-08-21 03:30' +%s)
EVAL_BY=$(date -u -d '2026-08-21 04:10' +%s)
BEST0=$(python -c "import json; print(json.load(open('runs/r4_edsr_full/best/best.json'))['step'])" 2>/dev/null || echo 0)

latest_step() {
  ls "$1/ckpts" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 || true
}

echo "=== master30 start ($(date -u +%H:%M)), best step $BEST0 ==="
wd=runs/r4_edsr_full
strikes=0
while :; do
  cur=$(latest_step "$wd"); cur=${cur:-0}
  now=$(date -u +%s)
  [ $((now + 1000)) -ge "$TRAIN_BY" ] && { echo "deadline, stop at $cur ($(date -u +%H:%M))"; break; }
  tgt=$((cur + 4500))
  with_chip_wd 900 "$wd/metrics.jsonl" timeout 1500 \
    python -m ml_super_resolution_tpu.cli train \
    --model edsr --scale 4 --batch-size 16 --device-data --steps-per-call 8 \
    --model-arg num_blocks=32 --model-arg features=256 --model-arg res_scale=0.1 \
    --lr-decay-steps 20000 --lr-decay-rate 0.5 \
    --eval-every 2000 --ckpt-every 2500 \
    --steps "$tgt" --workdir "$wd" >> "$wd.log" 2>&1
  rc=$?
  newcur=$(latest_step "$wd"); newcur=${newcur:-0}
  echo "chunk -> $tgt rc=$rc now=$newcur ($(date -u +%H:%M))"
  if [ "$newcur" -le "$cur" ]; then
    strikes=$((strikes + 1))
    [ "$strikes" -ge 2 ] && { echo "2 no-progress chunks — stopping filler (relay not in shape today)"; break; }
    chip_health 2 1200 300 || { echo "chip lost mid-filler"; break; }
  else
    strikes=0
  fi
done

BEST1=$(python -c "import json; print(json.load(open('runs/r4_edsr_full/best/best.json'))['step'])" 2>/dev/null || echo 0)
echo "best step: $BEST0 -> $BEST1"
if [ "$BEST1" != "$BEST0" ]; then
  echo "=== best improved: refresh rows ($(date -u +%H:%M)) ==="
  with_chip timeout 1200 python -m ml_super_resolution_tpu.cli eval \
    --workdir runs/r4_edsr_full --best \
    > runs/eval_edsr_full_r5.json 2> runs/eval_edsr_full_r5.err
  echo "plain: $(tail -1 runs/eval_edsr_full_r5.json)"
  if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
    with_chip timeout 1800 python -m ml_super_resolution_tpu.cli eval \
      --workdir runs/r4_edsr_full --best --ensemble \
      > runs/ens_edsr_full_r5.json 2> runs/ens_edsr_full_r5.err
    echo "ens: $(tail -1 runs/ens_edsr_full_r5.json)"
  fi
  if [ "$(date -u +%s)" -lt "$EVAL_BY" ]; then
    with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
      --workdir runs/r4_edsr_full --best --int8 \
      > runs/int8_edsr_full_r5b.json 2> runs/int8_edsr_full_r5b.err
    echo "int8: $(tail -1 runs/int8_edsr_full_r5b.json)"
  fi
else
  echo "best unchanged (step $BEST0) — banked 34k rows stand; no refresh needed"
fi
echo "MASTER30 DONE ($(date -u +%H:%M)) — chip QUIET from here (driver bench next)"
