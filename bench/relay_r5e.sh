#!/bin/bash
# Round-5 continuation batch 2 (this session): the rm48 arms re-queued
# VMEM-safe (pk4 multiplied the per-entry blocks past the 16M scoped
# limit — pk1/pk2 only), the fb96 knee check that died with that arm,
# a vx32+rect88 probe, the perstep compound ladder (LITP + the round-5
# vx/rect levers), and the PSNR gates for every new non-bit-exact
# combo (48 dB floor; perstep arms gate against perstep+rm0 — the
# full-resolution march of the SAME shading mode).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench/out bench/ladders

FAILED=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "bench/ladders/r5e_${name}.log" | tail -24
  rc=${PIPESTATUS[0]}
  echo "=== $name rc=$rc ==="
  if [ "$rc" -ne 0 ]; then FAILED=$((FAILED+1)); fi
}

run ab2_c4 5400 python bench/flag_ab.py c4 \
  rm48+vx48+rect96+fb48 rm48+pk2+vx48+rect96+fb48 \
  pk4+vx48+rect96+fb96 pk8+vx32+rect88+fb48

run ab2_c4ps 5400 python bench/flag_ab.py c4 \
  perstep+pk4+vx48+rect96+fb48 perstep+pk4+vx32+rect96+fb48 \
  perstep+rm48+vx48+rect96+fb48

run psnr2_c4 3600 python bench/psnr_c3.py c4 rm0 \
  rm48+vx48+rect96 vx32+rect88

run psnr2_c4ps 3600 python bench/psnr_c3.py c4 perstep+rm0 \
  perstep perstep+vx48+rect96 perstep+vx32+rect96 \
  perstep+rm48+vx48+rect96

if [ "$FAILED" -ne 0 ]; then
  echo "R5E INCOMPLETE: $FAILED step(s) failed"; exit 1
fi
echo R5E DONE
