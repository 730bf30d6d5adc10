#!/bin/bash
# Wedge-outlast chain: if master12's 25-attempt health gate exhausts,
# keep probing (up to ~3 h) and relaunch master12 once the relay answers.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh

M12=$(cat /tmp/master12.pid 2>/dev/null || echo 0)
while [ "$M12" -gt 0 ] && kill -0 "$M12" 2>/dev/null; do sleep 30; done

if ! grep -q "CHIP NEVER RECOVERED" runs/master12.log; then
  echo "master12 completed its gate on its own; nothing to do ($(date -u +%H:%M))"
  exit 0
fi

echo "=== extended gate ($(date -u +%H:%M)) ==="
chip_health 70 || { echo "CHIP STILL DEAD after extended gate ($(date -u +%H:%M))"; exit 1; }
echo "=== relay back; relaunching master12 ($(date -u +%H:%M)) ==="
bash runs/master12.sh >> runs/master12.log 2>&1
echo "MASTER13 DONE ($(date -u +%H:%M))"
