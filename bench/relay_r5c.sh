#!/bin/bash
# Round-5 part 5 device batch: the two missing device-diff rows
# (perstep-paired LITP + the c5-class production layout), then the
# r5b A/B ladders (c4 compound retune, perstep pairing win, PSNR
# gates), then BASELINE regeneration.  Waits for the TPU relay first
# (axon backend init HANGS when the relay is down — probe in a
# subprocess under timeout, DESIGN 6).  Serialized: one host core.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out bench/ladders

echo "=== waiting for TPU relay ==="
tries=0
until timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  tries=$((tries+1))
  echo "relay down (probe $tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 60 ]; then echo "RELAY NEVER CAME UP"; exit 2; fi
  sleep 300
done
echo "=== relay up after $tries retries $(date -u +%H:%M:%S) ==="

FAILED=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "bench/out/r5c_${name}.log" | tail -24
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -ne 0 ]; then
    FAILED=$((FAILED+1))
    if ! timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then
      echo "RELAY LOST after $name — aborting (re-run when up)"; exit 2
    fi
  fi
}

# 1. the two missing on-device rows (each = TPU render + float64 CPU
#    oracle on the one core; 4K c5 case is the long one)
run ddiff_perstep 7200 python bench/device_diff.py perstep_paired \
  --json=bench/out/device_diff_perstep.json
run ddiff_c5class 10800 python bench/device_diff.py c5_class \
  --json=bench/out/device_diff_c5class.json

# 2. merge the fresh rows into the canonical device_diff.json
python - <<'EOF'
import json, os
base = "bench/out/device_diff.json"
recs = json.load(open(base)) if os.path.exists(base) else []
by = {r["case"]: r for r in recs}
for p in ("bench/out/device_diff_perstep.json",
          "bench/out/device_diff_c5class.json"):
    if os.path.exists(p):
        for r in json.load(open(p)):
            by[r["case"]] = r
merged = list(by.values())
json.dump(merged, open(base, "w"), indent=1)
print("device_diff.json rows:", len(merged))
EOF

# 3. the r5b ladder batch (c4 compound retune, perstep pairing win,
#    PSNR gates) — has its own relay guards + ladder copies
bash bench/relay_r5b.sh
r5b_rc=$?
if [ "$r5b_rc" -ne 0 ]; then FAILED=$((FAILED+1)); fi

# 4. regenerate the measured tables from the fresh artifacts
python bench/emit_baseline.py && \
  cp -f bench/out/device_diff.json bench/ladders/device_diff_r5.json

if [ "$FAILED" -ne 0 ]; then
  echo "R5C INCOMPLETE: $FAILED step(s) failed — no DONE marker"; exit 1
fi
touch bench/out/R5C_DONE
echo R5C DONE
