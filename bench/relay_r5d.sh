#!/bin/bash
# Round-5 continuation batch (the recycled container wiped bench/out
# before relay_r5c ever ran; the 11 landed device-diff rows are
# restored from BASELINE.md into bench/ladders/device_diff_r5_restored.json).
# Reordered vs r5c: the r5b TIMING ladders run FIRST (they decide the
# c4 preset flip and need a quiet host), the two long float64-oracle
# diffs after.  Waits for the TPU relay (axon init HANGS when it is
# down — probe in a subprocess under timeout, DESIGN 6).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out bench/ladders

echo "=== waiting for TPU relay ==="
tries=0
until timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  tries=$((tries+1))
  echo "relay down (probe $tries) $(date -u +%H:%M:%S)"
  if [ "$tries" -ge 12 ]; then echo "RELAY NEVER CAME UP"; exit 2; fi
  sleep 120
done
echo "=== relay up after $tries retries $(date -u +%H:%M:%S) ==="

FAILED=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "bench/out/r5d_${name}.log" | tail -24
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

# 1. c4 center compound ladder at the production cadence (bf16c is a
#    NO-OP on c4 — the preset already ships warp_canvas_fp32=False;
#    pk16 arms dropped: warp_pack caps at 8 by validation, and the
#    measured pk trend is flat past pk4 — DESIGN 5k)
run ab_c4 5400 python bench/flag_ab.py c4 \
  base+fb48 pk8+fb48 pk8+vx48+fb48 pk8+vx48+ilv+fb48 \
  pk4+vx48+fb48 pk8+vx32+fb48 pk8+vx48+rect96+fb48 \
  pk8+vx32+rect96+fb48 pk4+vx32+rect96+fb48

# 2. perstep: pairing landed (round 5) — measure the win + pack compound
run ab_c4ps 3600 python bench/flag_ab.py c4 \
  perstep+fb48 perstep+pk8+fb48 perstep+pk4+fb48

# 3. PSNR gates for the non-bit-exact levers: 48 dB floor
run psnr_c4 3600 python bench/psnr_c3.py c4 base rm0 vx48 vx32 pk8+vx48 \
  rect96 pk8+vx48+rect96 pk8+vx32+rect96
cp -f bench/out/r5d_ab_c4.log bench/ladders/r5b_ab_c4.log 2>/dev/null
cp -f bench/out/r5d_ab_c4ps.log bench/ladders/r5b_ab_c4ps.log 2>/dev/null
cp -f bench/out/r5d_psnr_c4.log bench/ladders/r5b_psnr_c4.log 2>/dev/null
touch bench/out/R5D_LADDERS_DONE
echo "=== LADDERS DONE $(date -u +%H:%M:%S) ==="

# 4. the two missing on-device rows (each = TPU render + float64 CPU
#    oracle on the one core; the 4K c5 case is the long one)
run ddiff_perstep 5400 python bench/device_diff.py perstep_paired \
  --json=bench/out/device_diff_perstep.json
run ddiff_c5class 9000 python bench/device_diff.py c5_class \
  --json=bench/out/device_diff_c5class.json

# 5. merge the fresh rows into the canonical device_diff.json
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
cp -f bench/out/device_diff.json bench/ladders/device_diff_r5.json

if [ "$FAILED" -ne 0 ]; then
  echo "R5D INCOMPLETE: $FAILED step(s) failed — no DONE marker"; exit 1
fi
touch bench/out/R5D_DONE
echo R5D DONE
