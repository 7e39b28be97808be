#!/bin/bash
# Round-4 orchestrator, take 2 (after the paired-fan Mosaic fix): run
# phase 1c, then after a short grace window (touch
# bench/out/SKIP_AUTO_PHASE2 to take manual control) phase 2, so a dead
# session still yields the round's full artifact set.
cd /root/repo
while true; do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "RELAY UP at $(date) — starting phase 1c"
    bash bench/device_phase1c.sh > bench/out/phase1c_driver.log 2>&1
    echo "PHASE1C EXIT rc=$? at $(date)"
    touch bench/out/PHASE1C_DONE
    echo "grace window 600s before auto phase 2 (touch bench/out/SKIP_AUTO_PHASE2 to stop)"
    sleep 600
    if [ -e bench/out/SKIP_AUTO_PHASE2 ]; then
      echo "SKIP_AUTO_PHASE2 present — stopping after phase 1c"
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
