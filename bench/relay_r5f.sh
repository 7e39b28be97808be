#!/bin/bash
# Round-5 FINAL capture (post c4-preset-flip): re-measure every table
# the emitter owns on the flipped preset, re-diff the two c4-class
# layouts on device, merge every device_diff part-file, and regenerate
# BASELINE.md.  Device-bound timing steps run FIRST (the c5_class
# float64 oracle from relay_r5d may still be churning the single host
# core — device window timing is robust to that, the base-arm anchor
# matched r5b to 0.2% under the same contention); the CPU-bound
# float64 oracle diffs run after.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out bench/ladders

FAILED=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "bench/out/r5f_${name}.log" | tail -16
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -ne 0 ]; then FAILED=$((FAILED+1)); fi
}

# 1. measured suite -> BASELINE.md MEASURED section (flipped c4; the
#    c4:perstep row now exercises the paired LITP kernel + the flip)
run suite 3600 python bench/suite.py c1 c2 c3 c4 c4:perstep c5shard \
  --json=bench/out/suite.json

# 2. headline: 3 separate processes for the cross-process band
run bench1 1200 python bench.py
run bench2 1200 python bench.py
run bench3 1200 python bench.py
python - <<'PYEOF'
import json
recs = []
for i in (1, 2, 3):
    try:
        for line in open(f"bench/out/r5f_bench{i}.log"):
            line = line.strip()
            if line.startswith("{"):
                recs.append(json.loads(line))
    except FileNotFoundError:
        pass
json.dump(recs, open("bench/out/bench.json", "w"), indent=1)
print(f"collected {len(recs)} bench records")
PYEOF

# 3. measured roofline on the flipped presets (+ the instrument rows)
run roofline 2400 python bench/roofline.py c3 c4 c5 \
  c3:coarse+ilv c4:coarse+ilv --measure

# 4. the two c4-class on-device rows, re-run on the FLIPPED layout
#    (the row names now carry vx/rect/pk, so these APPEND; the old
#    rect112 rows remain as the pre-flip record)
run ddiff_c4flip 7200 python bench/device_diff.py center_light_paired \
  perstep_paired --json=bench/out/device_diff_c4flip.json

# 5. merge every device_diff part-file into the canonical record
python - <<'EOF'
import json, os
base = "bench/out/device_diff.json"
recs = json.load(open(base)) if os.path.exists(base) else []
by = {r["case"]: r for r in recs}
for p in ("bench/out/device_diff_perstep.json",
          "bench/out/device_diff_c5class.json",
          "bench/out/device_diff_c4flip.json"):
    if os.path.exists(p):
        for r in json.load(open(p)):
            by[r["case"]] = r
merged = list(by.values())
json.dump(merged, open(base, "w"), indent=1)
print("device_diff.json rows:", len(merged))
EOF
cp -f bench/out/device_diff.json bench/ladders/device_diff_r5.json

# 6. regenerate BASELINE.md's generated sections + durable copies
run emit 300 python bench/emit_baseline.py
cp -f bench/out/suite.json bench/ladders/r5f_suite.json
cp -f bench/out/bench.json bench/ladders/r5f_bench.json
cp -f bench/out/roofline.json bench/ladders/r5f_roofline.json

if [ "$FAILED" -ne 0 ]; then
  echo "R5F INCOMPLETE: $FAILED step(s) failed"; exit 1
fi
echo R5F DONE
