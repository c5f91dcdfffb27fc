#!/bin/bash
# Round-4 follow-up: on-chip spec_len sweep for the single-stream
# latency target (VERDICT r3 item 3: RTFx_b1 >= 200, i.e. <=150 ms per
# 30 s chunk). Runs the prompt-lookup speculation rows — plain AND
# compounded with the whole-step B=1 kernel — at several draft windows.
# Each spec_len is a distinct static shape (one compile each, cached by
# the persistent compile cache afterward).
#
# Run AFTER scripts/r4_tpu_capture.sh (never concurrently — host
# contention skews the tunnel timings ~11%, round-3 lesson).
#
# Usage: bash scripts/r4_spec_sweep.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/r4_spec_sweep.log}"

say() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "spec_len sweep start"
for sl in 3 5 8 12; do
  say "spec_len=$sl"
  timeout 5400 env BENCH_SPEC_LEN=$sl BENCH_TOKEN_ROWS=192 \
    BENCH_B1=1 BENCH_SPEC=1 BENCH_SPEC_B64=0 BENCH_BEAM=0 BENCH_ROWS=0 \
    BENCH_MFU=0 python bench.py >> "$LOG" 2>&1 || say "spec_len $sl rc=$?"
done
say "spec_len sweep done — log at $LOG"
