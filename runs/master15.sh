#!/bin/bash
# Wedge-outlast, take 2 (after diagnosing that fast-cadence probing
# re-wedges the relay): 35 min of COMPLETE quiet, then patient probes
# (300 s budget / 10 min apart, up to ~2 h), then the master12 payload
# and the master14 payload.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

echo "=== quiet period until $(date -u -d '+35 minutes' +%H:%M) ==="
sleep 2100

echo "=== patient gate ($(date -u +%H:%M)) ==="
chip_health 12 300 600 || { echo "CHIP STILL DEAD ($(date -u +%H:%M))"; exit 1; }
echo "=== relay back ($(date -u +%H:%M)); running master12 payload ==="
bash runs/master12.sh >> runs/master12.log 2>&1
echo "=== master12 payload done ($(date -u +%H:%M)); master14 payload ==="
rm -f /tmp/master12.pid /tmp/master13.pid  # master14 waits on these
bash runs/master14.sh >> runs/master14.log 2>&1
echo "MASTER15 DONE ($(date -u +%H:%M))"
