#!/bin/bash
# Round-4 device phase 3: the headline gap-window probes + the
# VMEM-resident-canvas (warp_canvas_vmem / warp_bands) ladder, run
# AFTER phase 2's artifact captures.
#
# Ordering: compile-checks first (a Mosaic lowering failure must not
# cost the timing steps), then the c3 headline probes (the round's #1
# verdict item), then the c4/c5 resident-canvas A/Bs.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" 2>&1 | tee "bench/out/phase3_${name}.log" | tail -40
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

# 0) Mosaic compile-checks for the resident canvas: every new layout
# must lower on device before any timing (interpret mode proves math,
# not lowering).  One frame each, real preset scale.
TMO=1800 run mosaic_c4res python -m volq.cli --preset c4 --frames 1 \
    --set render.warp_bands=3 --set render.warp_canvas_vmem=1 \
    --out /tmp/d_c4res --png
TMO=1800 run mosaic_c4cres python -m volq.cli --preset c4 --frames 1 \
    --set render.warp_coarse=1 --set render.warp_canvas_vmem=1 \
    --out /tmp/d_c4cres --png

# 1) c3 headline: attribute the 4.03 (r3) vs 4.22 (today) gap — code
# drift or environment drift.  Interleaved same-day A/B, 3 rounds each.
TMO=4800 run regress bash bench/regress_ab.sh

# 2) c3 headline: dispatch-amortization knee at ~4.2 ms frames
TMO=2400 run fb_c3 python bench/fb_sweep.py c3 12 18 24 36

# 3) window-traffic upper bounds: what killing ALL canvas-window DMA
# is worth per preset (the resident canvas can reclaim at most this)
TMO=2400 run windma_c3 env VOLQ_ABLATE=windma python bench/flag_ab.py c3 base
TMO=2400 run windma_c4 env VOLQ_ABLATE=windma python bench/flag_ab.py c4 base
TMO=3600 run windma_c5 env VOLQ_ABLATE=windma python bench/flag_ab.py c5 base

# 4) c4 resident-canvas ladder (<8 ms target).  bands*+res is EXACT
# (no PSNR gate); coarse+res rides the coarse gate (45.15 dB — fails
# the 48 dB floor; measured for the ladder's completeness); cs70+res
# is the sigma-canvas middle (PSNR-gated below, expected ~48-51 dB at
# scale 0.70 vs coarse's 0.57).  Roofline: c4's windows are 2.0 GB of
# its 2.14 GB/frame HBM traffic — res aims at the dominant term.
TMO=6000 run ab_c4res python bench/flag_ab.py c4 base bands3+res bands4+res bands3 coarse+res cs70+res cs70+bands2+res
TMO=2400 run psnr_c4s python bench/psnr_c3.py c4 base cs70 rm0
# the per-step fidelity mode is window-heavy too (win_hazard 577) and
# bands+res is EXACT, so it applies without any quality question
TMO=3600 run ab_c4psres python bench/flag_ab.py c4 perstep perstep+bands3+res

# 5) c5 single-chip: banded resident canvas on the shipped coarse+ilv
# preset (base ships coarse+ilv; bands2+res fits the VMEM budget).
# Roofline: c5's windows are 6.4 GB of 6.9 GB/frame even after the
# coarse+ilv diet.
TMO=4800 run ab_c5res python bench/flag_ab.py c5 base bands2+res bands3+res

# 5b) c3 headline margin via sigma+res: windows are 677 MB of c3's
# 1.13 GB/frame; cs68 fits un-banded (12.6 MB), cs75+bands2 at 9.2 MB.
# PSNR gate: scale 0.68/0.75 vs the 0.55 march ratio.
TMO=6000 run ab_c3res python bench/flag_ab.py c3 base cs68+res cs75+bands2+res
TMO=2400 run psnr_c3s python bench/psnr_c3.py c3 base cs68 cs75 rm0

# 6) fresh in-process ablation breakdown on the HEAD kernel (the
# round-2/3 breakdowns predate ~1.5 kLoC of kernel change) — targets
# the next diet
TMO=3600 run ablate_c3 python bench/ablate_c3.py c3
TMO=3600 run ablate_c4 python bench/ablate_c3.py c4

# 6b) refresh the on-device oracle table on the post-sigma kernel,
# including the two new resident-canvas cases (bands3+res, cs70+res)
TMO=5400 run device_diff python bench/device_diff.py --json=bench/out/device_diff.json

# 7) redo the fly-through GIF with a fly-sized rect: the phase-2
# capture (dolly 0.92 deep into the near-fade) counted rect_overflow
# ~400/1024 and shift_clamped up to 13k mid-flight — visible clipping.
# Gentler path + rect 192 / K 8 (the K budget scales with rect/march
# ratio) keeps the counters near the base budget while still entering
# the near-fade shell.
TMO=3600 run gif_fly2 python -m volq.cli --preset c3 --frames 150 \
    --dolly 0.55 --orbit 40 \
    --set render.warp_rect=192 --set render.warp_shift_max=8 \
    --gif docs/images/c3_flythrough.gif --gif-width 640

echo "PHASE3 DONE"
