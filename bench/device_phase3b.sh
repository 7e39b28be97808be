#!/bin/bash
# Round-4 device phase 3b: the trimmed phase-3 program, re-prioritized
# for the continuation session's wall clock (the relay was down when
# phase 3 was queued; it is up now).  Order: Mosaic compile-checks,
# then the c4 resident-canvas <8ms ladder, then the c3 headline-margin
# ladder, then the PSNR gates for the sigma variants, then the full
# on-device oracle table.  Deferred from device_phase3.sh (run if time
# remains): regress_ab, fb_sweep, windma bounds, ablates, c5 res
# ladder, gif_fly2.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out
FAILED=0
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" 2>&1 | tee "bench/out/phase3_${name}.log" | tail -40
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -ne 0 ]; then
    FAILED=$((FAILED + 1))
  fi
  if [ "$rc" -eq 124 ]; then
    if ! timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then
      echo "RELAY LOST after $name — aborting phase (re-run when up)"
      exit 2
    fi
  fi
}

# 0) Mosaic compile-checks: the resident-canvas layouts must lower on
# device before any timing ladder spends its budget on them.
TMO=1800 run mosaic_c4res python -m volq.cli --preset c4 --frames 1 \
    --set render.warp_bands=3 --set render.warp_canvas_vmem=1 \
    --out /tmp/d_c4res --png
TMO=1800 run mosaic_c4cs python -m volq.cli --preset c4 --frames 1 \
    --set render.warp_canvas_scale=0.7 --set render.warp_canvas_vmem=1 \
    --out /tmp/d_c4cs --png

# 1) c4 resident-canvas ladder (<8 ms target).  bands*+res is EXACT
# (no PSNR gate); cs70* rides the sigma PSNR gate below.  Roofline:
# c4's windows are 2.0 GB of its 2.14 GB/frame HBM traffic.
TMO=6000 run ab_c4res python bench/flag_ab.py c4 base bands3+res bands4+res cs70+res cs70+bands2+res

# 2) c3 headline margin: bands3+res is EXACT; cs68 fits un-banded
# (12.6 MB), cs75+bands2 at 9.2 MB.
TMO=6000 run ab_c3res python bench/flag_ab.py c3 base bands3+res cs68+res cs75+bands2+res

# 3) PSNR gates for the sigma variants (only meaningful if a cs*
# variant won its ladder; bands+res needs no gate)
TMO=2400 run psnr_c4s python bench/psnr_c3.py c4 base cs70 rm0
TMO=2400 run psnr_c3s python bench/psnr_c3.py c3 base cs68 cs75 rm0

# 4) the on-device oracle table on the shipped (post-sigma) kernel —
# all 11 cases incl. the resident-canvas ones
TMO=5400 run device_diff python bench/device_diff.py --json=bench/out/device_diff.json

# 5) c4 per-step fidelity mode with the exact banded resident canvas
TMO=3600 run ab_c4psres python bench/flag_ab.py c4 perstep perstep+bands3+res

# The DONE marker means every step ran clean; a partial phase must be
# re-run, so it exits non-zero and leaves no marker (round-4 advisor
# finding: rc!=0 was echoed and ignored, making DONE signal success
# even when every step failed).
if [ "$FAILED" -ne 0 ]; then
  echo "PHASE3B INCOMPLETE: $FAILED step(s) failed — no DONE marker"
  exit 1
fi
echo "PHASE3B DONE"
touch bench/out/PHASE3B_DONE
