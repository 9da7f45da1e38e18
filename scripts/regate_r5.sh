#!/bin/bash
# Round-5 re-gate of parity-matrix rows made stale by the r4 noise-lib hfield
# fix, plus rows never run on the current stack (VERDICT r4 next-round #4).
# One combo per process (docs/PERF_NOTES.md: LLVM CPU JIT section-memory
# exhaustion on multi-combo processes), serialized (one physical core).
set -u
cd /root/repo
OUT=${1:-/tmp/regate_r5.log}
COMBOS=(
  "b2-perlin-stance"
  "hyqreal2-perlin-stance"
  "mini_cheetah-random_boxes-stance"
  "go2-slippery-stance"
  "aliengo-random_boxes-random"
  "b2-random_boxes-random"
  "go2-stairs-random"
  "go2-ramp-random"
)
for k in "${COMBOS[@]}"; do
  echo "=== $k $(date +%T) ===" >> "$OUT"
  RUN_SLOW=1 timeout 2100 nice -n 19 python -m pytest \
    "tests/test_parity_matrix.py::test_matrix_parity[$k]" -q -rA \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date +%T)" >> "$OUT"
done
echo "=== long_horizon $(date +%T) ===" >> "$OUT"
RUN_SLOW=1 timeout 2100 nice -n 19 python -m pytest \
  tests/test_long_horizon.py -q -rA >> "$OUT" 2>&1
echo "--- rc=$? $(date +%T)" >> "$OUT"
echo "ALL DONE $(date +%T)" >> "$OUT"
