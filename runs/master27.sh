#!/bin/bash
# Round-5 queue #1: health gate -> trunk-gap probes (VERDICT r4 next #1/#2)
#   -> EDSR-full int8 eval on chip (next #3) -> EDSR-full training filler
#      (next #4) resuming runs/r4_edsr_full in 4500-step chunks.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== master27 start ($(date -u +%H:%M)) ==="
chip_health 6 300 240 || { echo "CHIP NOT HEALTHY ($(date -u +%H:%M))"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

echo "=== trunk-gap probes ($(date -u +%H:%M)) ==="
with_chip timeout 2400 python tools/probe_trunk_gap.py \
  2> runs/probe_trunk_gap.err
echo "probe rc=$? ($(date -u +%H:%M))"
grep '^#' runs/probe_trunk_gap.err

echo "=== EDSR-full int8 PTQ eval on chip ($(date -u +%H:%M)) ==="
with_chip timeout 1500 python -m ml_super_resolution_tpu.cli eval \
  --workdir runs/r4_edsr_full --best --int8 \
  > runs/int8_edsr_full_chip.json 2> runs/int8_edsr_full_chip.err
echo "int8 eval rc=$?: $(tail -1 runs/int8_edsr_full_chip.json)"

echo "MASTER27 PHASE-1 DONE ($(date -u +%H:%M))"
