#!/bin/bash
# Round-4 device phase 1b: supplementary A/Bs the phase-1 data demanded.
# Phase 1 measured vx48/hz2 only STACKED with coarse+ilv, and the diet
# lost on c3 (base 4.23 ms vs 4.7-4.9 for every coarse/ilv variant), so
# the un-stacked margin rungs were never timed.  Run after phase 1,
# before the preset-flip decision.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" 2>&1 | tee "bench/out/phase1b_${name}.log" | tail -40
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

# c3 margin rungs, un-stacked (base re-timed in the same process so the
# deltas are same-process clean)
TMO=2400 run ab_c3b python bench/flag_ab.py c3 base vx48 hz2 vx48+hz2

echo "PHASE1B DONE"
