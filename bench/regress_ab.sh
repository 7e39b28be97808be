#!/bin/bash
# Same-day A/B of the round-3 snapshot kernel vs HEAD on the headline
# c3 bench: today's captures time c3 at ~4.20-4.23 ms where round 3
# recorded 4.03 — is that code drift (round-4 kernel generalization)
# or environment drift?  Alternate 3 runs of each in separate
# processes (the protocol is identical: time_frames 24, fb=12,
# median-of-3); interleaving controls slow environment drift.
# Prereq: git worktree of the round-3 snapshot at /tmp/volq_r3.
set -u
cd /root/repo
mkdir -p bench/out
: > bench/out/regress_ab.log
for i in 1 2 3; do
  echo "--- round $i: r3 snapshot ---" | tee -a bench/out/regress_ab.log
  (cd /tmp/volq_r3 && timeout 1200 python bench.py) 2>/dev/null \
    | grep '^{' | tee -a bench/out/regress_ab.log
  echo "--- round $i: HEAD ---" | tee -a bench/out/regress_ab.log
  timeout 1200 python bench.py --child 2>/dev/null \
    | grep '^RESULT' | tee -a bench/out/regress_ab.log
done
echo "REGRESS_AB DONE" | tee -a bench/out/regress_ab.log
