#!/bin/bash
# Round-4b: kernel-row capture AFTER the Mosaic layout fix (commit
# 183a84d) — the four whole-step variants now pass the full Mosaic
# compile at large-v3; this measures them on the real chip and
# re-captures the bench rows that were skipped in the step-2 run.
# Run AFTER r4_tpu_capture.sh finishes (chip contention).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/r4b_kernel.log}"
say() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "r4b capture start"

say "1. b1 kernel vs xla (single-token)"
timeout 3600 env VARIANTS=xla,kernel python scripts/b1_kernel_bench.py 128 \
  >> "$LOG" 2>&1 || say "rc=$?"

say "2. M-token verify blocks (BLK=6)"
timeout 3600 env VARIANTS=xla_multi,kernel_multi BLK=6 \
  python scripts/b1_kernel_bench.py 126 >> "$LOG" 2>&1 || say "rc=$?"

say "3. beam rows (NB=5)"
timeout 3600 env VARIANTS=xla_beam,kernel_beam NB=5 \
  python scripts/b1_kernel_bench.py 128 >> "$LOG" 2>&1 || say "rc=$?"

say "4. multi-stream rows (NROWS=4)"
timeout 3600 env VARIANTS=xla_rows,kernel_rows NROWS=4 \
  python scripts/b1_kernel_bench.py 128 >> "$LOG" 2>&1 || say "rc=$?"

say "5. bench.py kernel-dependent rows only"
timeout 7200 env BENCH_HEADLINE=192 BENCH_TOKEN_ROWS=192 BENCH_MFU=0 \
  BENCH_SPEC_B64=0 python bench.py >> "$LOG" 2>&1 || say "rc=$?"

say "r4b capture done — log at $LOG"
