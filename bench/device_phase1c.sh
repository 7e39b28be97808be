#!/bin/bash
# Round-4 device phase 1c: the phase-1 steps that were re-queued after
# the paired-fan Mosaic fix (i1 lane-concat -> f32; render/kernel.py
# _fan_pair).  The original phase-1 run crashed every PAIRED coarse
# variant (c4/c5) at compile time; c3's A/B + PSNR completed and stand.
# Also runs the c3 margin rungs un-stacked (the diet lost on c3, so
# vx48/hz2 need solo timings for the flip decision).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" 2>&1 | tee "bench/out/phase1_${name}.log" | tail -40
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -eq 124 ]; then
    if ! timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then
      echo "RELAY LOST after $name — aborting phase (re-run when up)"
      exit 2
    fi
  fi
}

# c3 margin rungs, un-stacked, highest value first (headline clause)
TMO=2400 run ab_c3b python bench/flag_ab.py c3 base vx48 hz2 vx48+hz2

# c4: the diet's designed-for preset (window-DMA-bound; <8 ms target).
# bf16c dropped from the original queue: c4 already ships a bf16 canvas.
TMO=2400 run ab_c4 python bench/flag_ab.py c4 base ilv coarse coarse+ilv
TMO=2400 run psnr_c4 python bench/psnr_c3.py c4 base coarse rm0

# c5 single-chip + quality gate (paired preset — needed the fix)
TMO=3600 run ab_c5 python bench/flag_ab.py c5 base coarse+ilv
TMO=2400 run psnr_c5 python bench/psnr_c3.py c5 base coarse

# c2 at its shipped preset (unpaired; cheap)
TMO=2400 run ab_c2 python bench/flag_ab.py c2 base ilv coarse+ilv

# c4 per-step fidelity mode (unpaired): diet applicability + a current
# number for the BASELINE row
TMO=2400 run ab_c4ps python bench/flag_ab.py c4 perstep perstep+ilv perstep+coarse perstep+coarse+ilv

echo "PHASE1C DONE"
