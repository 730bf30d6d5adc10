#!/bin/bash
# Wedge-outlast, take 3: the 10-min-cadence patient gate failed 4 straight
# probes (wedge began ~21:00, deepest observed).  Hypothesis: every
# timed-out probe is an insult that restarts the server-side healing
# clock.  This script goes COMPLETELY quiet for 90 min, then issues ONE
# 600-s probe; on failure, one more 60-min quiet + final probe.  On
# success it runs the master12 payload (ensemble evals on chip, bench
# preview, full EDSR to 100k) then the master14 payload (int8 on-chip
# evals + AOT artifact chip check).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

probe () {
  with_chip timeout 600 python -c \
    "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))"
}

echo "=== full quiet until $(date -u -d '+90 minutes' +%H:%M) ==="
sleep 5400
echo "=== probe 1 ($(date -u +%H:%M)) ==="
if ! probe; then
  echo "probe 1 failed ($(date -u +%H:%M)); one more 60-min quiet"
  sleep 3600
  echo "=== probe 2 ($(date -u +%H:%M)) ==="
  if ! probe; then
    echo "CHIP STILL DEAD ($(date -u +%H:%M)); leaving the relay untouched"
    exit 1
  fi
fi
echo "=== relay back ($(date -u +%H:%M)); master12 payload ==="
bash runs/master12.sh >> runs/master12.log 2>&1
echo "=== master12 payload done ($(date -u +%H:%M)); master14 payload ==="
rm -f /tmp/master12.pid /tmp/master13.pid
bash runs/master14.sh >> runs/master14.log 2>&1
echo "MASTER16 DONE ($(date -u +%H:%M))"
