#!/bin/bash
# Round-4 device capture phase 2: run AFTER the phase-1 A/Bs have been
# read and any preset flips committed.  Produces every driver/judge
# artifact for the round: on-device oracle diffs, the measured suite,
# BASELINE.md regeneration, the 3-process headline band, the measured
# roofline, the c5 combine timing, and the demo GIFs.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" 2>&1 | tee "bench/out/phase2_${name}.log" | tail -30
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -eq 124 ]; then
    # step hit its timeout — if the relay itself is gone, abort the
    # phase now instead of burning every remaining step's timeout;
    # completed captures are already on disk and the phase can re-run.
    if ! timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then
      echo "RELAY LOST after $name — aborting phase (re-run when up)"
      exit 2
    fi
  fi
}

# on-device oracle correctness table (8 cases, ~25 min; nothing else
# may touch the TPU while it runs)
TMO=4200 run device_diff python bench/device_diff.py --json=bench/out/device_diff.json

# measured suite -> BASELINE.md MEASURED section
TMO=3600 run suite python bench/suite.py c1 c2 c3 c4 c4:perstep c5shard --json=bench/out/suite.json

# headline capture: 3 separate processes for the cross-process band,
# collected into bench/out/bench.json for emit_baseline
TMO=1200 run bench1 python bench.py
TMO=1200 run bench2 python bench.py
TMO=1200 run bench3 python bench.py
python - <<'PYEOF'
import json
recs = []
for i in (1, 2, 3):
    try:
        for line in open(f"bench/out/phase2_bench{i}.log"):
            line = line.strip()
            if line.startswith("{"):
                recs.append(json.loads(line))
    except FileNotFoundError:
        pass
json.dump(recs, open("bench/out/bench.json", "w"), indent=1)
print(f"collected {len(recs)} bench records")
PYEOF

# measured roofline + chip calibrations + c5 combine compute timing
TMO=1200 run calib python bench/roofline.py --calibrate
# presets ship unflipped (the diet measured negative, DESIGN 5g), so
# the roofline rows are the shipped bases plus the diet layouts as
# documentation of the model-vs-measured gap
TMO=2400 run roofline python bench/roofline.py c3 c4 c5 c3:coarse+ilv c4:coarse+ilv --measure
TMO=1200 run combine python bench/c5_combine_model.py

# regenerate BASELINE.md's MEASURED / DEVICE_DIFF / ROOFLINE sections
# from everything captured above (single emit so the doc is consistent)
TMO=600  run emit python bench/emit_baseline.py

# demo GIFs: c3 fly-through (camera enters the cloud — straddlers) and
# the c5 4D-animated noise (the one BASELINE config with no visual)
TMO=3600 run gif_fly python -m volq.cli --preset c3 --frames 180 \
    --dolly 0.92 --orbit 25 \
    --gif docs/images/c3_flythrough.gif --gif-width 640
TMO=3600 run gif_c5 python -m volq.cli --preset c5 --frames 120 \
    --gif docs/images/c5_4dnoise.gif --gif-width 640

echo "PHASE2 DONE"
