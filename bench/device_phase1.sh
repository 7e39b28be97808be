#!/bin/bash
# Round-4 device measurement phase 1: window-diet A/Bs + quality gates.
# Run when the axon relay is up; output -> bench/out/phase1_*.log.
# Each step bounded; a hung relay fails the step, not the script.
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

# sanity + warm the compile cache
TMO=900 run sanity python -m volq.cli --preset c1 --frames 2 --out /tmp/d_c1 --png

# Mosaic compile-check of the new canvas layouts FIRST (interpret mode
# proves math, not lowering): tiny warp render with coarse+ilv on, then
# each alone.  A failure here aborts any preset-flip plan.
TMO=900 run mosaic_small python -m volq.cli --preset c2 --frames 1 \
    --set render.width=256 --set render.height=256 --set n_particles=16 \
    --set render.warp_rect=96 --set render.warp_march_rect=48 \
    --set render.warp_chunk=16 --set render.warp_shift_max=8 \
    --set render.warp_coarse=1 --set render.warp_interleave=1 \
    --out /tmp/d_warp --png
TMO=900 run mosaic_c3like python -m volq.cli --preset c3 --frames 1 --set render.warp_coarse=1 --set render.warp_interleave=1 --out /tmp/d_c3co --png

# same-process A/Bs of the window-diet flags.  c3 FIRST: it is the
# headline config (500 Mrays/s clause), so if the relay window is
# short, the highest-value capture lands before anything else.
TMO=3600 run ab_c3 python bench/flag_ab.py c3 base ilv coarse coarse+ilv coarse+ilv+pair coarse+ilv+hz2 coarse+ilv+bf16c coarse+ilv+vx48
TMO=2400 run psnr_c3 python bench/psnr_c3.py c3 base coarse bf16c coarse+bf16c vx48 rm0
TMO=900 run mosaic_c4like python -m volq.cli --preset c4 --frames 1 --set render.warp_coarse=1 --set render.warp_interleave=1 --out /tmp/d_c4co --png
TMO=2400 run ab_c4 python bench/flag_ab.py c4 base ilv coarse coarse+ilv coarse+ilv+bf16c
TMO=2400 run psnr_c4 python bench/psnr_c3.py c4 base coarse bf16c coarse+bf16c rm0
TMO=2400 run ab_c4ps python bench/flag_ab.py c4 perstep perstep+ilv perstep+coarse perstep+coarse+ilv

# c5 single-chip (slow: ~80 ms/frame base) + c2 at its shipped preset
TMO=3600 run ab_c5 python bench/flag_ab.py c5 base coarse+ilv
TMO=2400 run ab_c2 python bench/flag_ab.py c2 base ilv coarse+ilv
TMO=2400 run psnr_c5 python bench/psnr_c3.py c5 base coarse

echo "PHASE1 DONE"
