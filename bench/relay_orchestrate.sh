#!/bin/bash
# Wait for the axon relay; run phase 1; then (after a 25-min grace
# window for a live session to read the A/Bs, flip presets, and/or
# touch bench/out/SKIP_AUTO_PHASE2) run phase 2 automatically so a
# dead session still yields the round's full artifact set.
cd /root/repo
while true; do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "RELAY UP at $(date) — starting phase 1"
    bash bench/device_phase1.sh > bench/out/phase1_driver.log 2>&1
    echo "PHASE1 EXIT rc=$? at $(date)"
    touch bench/out/PHASE1_DONE
    echo "grace window 1500s before auto phase 2 (touch bench/out/SKIP_AUTO_PHASE2 to stop)"
    sleep 1500
    if [ -e bench/out/SKIP_AUTO_PHASE2 ]; then
      echo "SKIP_AUTO_PHASE2 present — stopping after phase 1"
      exit 0
    fi
    echo "starting phase 2 at $(date)"
    bash bench/device_phase2.sh > bench/out/phase2_driver.log 2>&1
    echo "PHASE2 EXIT rc=$? at $(date)"
    touch bench/out/PHASE2_DONE
    exit 0
  fi
  echo "relay down at $(date)"
  sleep 120
done
