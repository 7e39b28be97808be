#!/bin/bash
# Round-5 part 2 device batch: c4 compound ladder + perstep pairing +
# quality gates.  Serialized (one host core); each step bounded; run
# AFTER the c5-class device-diff oracle finishes (CPU contention
# corrupts timing medians).  Output -> bench/out/r5b_*.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out bench/ladders
FAILED=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "bench/out/r5b_${name}.log" | tail -24
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

# 1. c4 center compound ladder at the production cadence (levers that
#    are bit-exact or already-gated first, then the gated candidates)
#    (bf16c is a NO-OP on c4 — the preset already ships
#    warp_canvas_fp32=False, so round-2's "pk8+bf16c+vx48 8.79 ms"
#    row was pk8+vx48)
run ab_c4 5400 python bench/flag_ab.py c4 \
  base+fb48 pk8+fb48 pk8+vx48+fb48 pk8+vx48+ilv+fb48 \
  pk16+vx48+fb48 pk8+vx32+fb48 pk8+vx48+rect96+fb48 \
  pk8+vx32+rect96+fb48 pk16+vx48+rect96+fb48

# 2. perstep: pairing landed (round 5) — measure the win + pack compound
#    (slab_vx is INERT in per-step mode — slab_vx_eff forces V)
run ab_c4ps 3600 python bench/flag_ab.py c4 \
  perstep+fb48 perstep+pk8+fb48 perstep+pk16+fb48

# 3. PSNR gates for the non-bit-exact levers (vs base and vs rm0-class
#    reference): 48 dB floor
run psnr_c4 3600 python bench/psnr_c3.py c4 base rm0 vx48 vx32 pk8+vx48 \
  rect96 pk8+vx48+rect96 pk8+vx32+rect96
cp -f bench/out/r5b_ab_c4.log bench/ladders/ 2>/dev/null
cp -f bench/out/r5b_ab_c4ps.log bench/ladders/ 2>/dev/null
cp -f bench/out/r5b_psnr_c4.log bench/ladders/ 2>/dev/null
if [ "$FAILED" -ne 0 ]; then
  echo "R5B INCOMPLETE: $FAILED step(s) failed — no DONE marker"; exit 1
fi
touch bench/out/R5B_DONE
echo R5B DONE
