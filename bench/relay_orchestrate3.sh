#!/bin/bash
# Round-4 orchestrator, take 3: wait for phase 2's artifact captures to
# finish, then run phase 3 (headline gap probes + resident-canvas
# ladder) automatically, so a dead session still yields the round's
# decision data.  Touch bench/out/SKIP_AUTO_PHASE3 for manual control.
cd /root/repo
while [ ! -e bench/out/PHASE2_DONE ]; do
  sleep 60
done
if [ -e bench/out/SKIP_AUTO_PHASE3 ]; then
  echo "SKIP_AUTO_PHASE3 present — stopping"
  exit 0
fi
while ! timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
do
  echo "relay down at $(date)"; sleep 120
done
echo "starting phase 3 at $(date)"
bash bench/device_phase3.sh > bench/out/phase3_driver.log 2>&1
echo "PHASE3 EXIT rc=$? at $(date)"
touch bench/out/PHASE3_DONE
