#!/bin/bash
# Round-4 queue #3: runs strictly after master22 exits (PID-wait chain).
# One job: a full-budget bench.py preview so the NEW secondary rows
# (lane-packed edsr/vdsr, edsr-full-folded MFU row) get a real-chip
# measurement before the driver's end-of-round bench.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== master23 start ($(date -u +%H:%M)) ==="
chip_health 8 || { echo "CHIP NEVER RECOVERED ($(date -u +%H:%M))"; exit 1; }
echo "healthy ($(date -u +%H:%M))"

# bench self-locks; run bare (never under with_chip)
timeout 1700 python bench.py > runs/bench_r4_preview2.out 2> runs/bench_r4_preview2.err
echo "bench rc=$? ($(date -u +%H:%M))"
tail -1 runs/bench_r4_preview2.out
grep -c '^#' runs/bench_r4_preview2.err || true
echo "MASTER23 DONE ($(date -u +%H:%M)) — chip quiet from here"
