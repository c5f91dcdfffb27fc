#!/bin/bash
# Round-4 TPU measurement capture (VERDICT r3 items 1-3, 10; ADVICE 1):
# every pending on-chip benchmark in PRIORITY order, individually
# timed out, appending to one log. Safe to re-run; the persistent
# compile cache (~/.cache/crisperwhisper_tpu/xla) makes retries cheap
# once a program has compiled ONCE.
#
#   1. b1 kernel bench — the four fused whole-step variants vs XLA
#      (round 3 shipped them Mosaic-broken; round 4 fixed lowering).
#   2. Full bench.py (headline + kernel rows + MFU/utilization block).
#   3. Ring-write strategy A/B, in-context batched speculation B=64.
#   4. Staged-ring quantum sweep (64/128/256) at the headline shape.
#   5. Assisted staged on/off A/B at B=1 (ADVICE r3 item 1).
#
# Usage: bash scripts/r4_tpu_capture.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/r4_tpu_capture.log}"

say() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "capture start"

say "0. smoke (device reachable?)"
timeout 300 python scripts/tpu_smoke.py >> "$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  say "smoke failed rc=$rc — tunnel down; aborting"
  exit 1
fi

say "1a. b1 kernel vs xla (single-token)"
timeout 5400 env VARIANTS=xla,kernel python scripts/b1_kernel_bench.py 128 \
  >> "$LOG" 2>&1 || say "b1 single rc=$?"

say "1b. M-token verify blocks (BLK=6)"
timeout 5400 env VARIANTS=xla_multi,kernel_multi BLK=6 \
  python scripts/b1_kernel_bench.py 126 >> "$LOG" 2>&1 || say "b1 multi rc=$?"

say "1c. beam rows (NB=5 — the hf-pipeline default decode)"
timeout 5400 env VARIANTS=xla_beam,kernel_beam NB=5 \
  python scripts/b1_kernel_bench.py 128 >> "$LOG" 2>&1 || say "b1 beam rc=$?"

say "1d. multi-stream rows (NROWS=4)"
timeout 5400 env VARIANTS=xla_rows,kernel_rows NROWS=4 \
  python scripts/b1_kernel_bench.py 128 >> "$LOG" 2>&1 || say "b1 rows rc=$?"

say "2. full bench.py (all rows + utilization)"
timeout 7200 python bench.py >> "$LOG" 2>&1 || say "bench rc=$?"

say "3. batched speculation B=64 by ring-write strategy (in context)"
for m in scatter dus dma; do
  say "   strategy=$m"
  timeout 3600 env CW_RING_SCATTER=$m ACCEPT=1.0,0.5 ITERS=2 \
    python scripts/spec_accept_bench.py 64 >> "$LOG" 2>&1 \
    || say "spec B=64 $m rc=$?"
done

say "4. staged-ring quantum sweep at the headline shape (decode rows only)"
for q in 0 64 128 256; do
  say "   staged=$q"
  timeout 3600 env BENCH_STAGED=$q BENCH_TOKEN_ROWS=192 BENCH_B1=0 \
    BENCH_SPEC=0 BENCH_BEAM=0 BENCH_ROWS=0 BENCH_SPEC_B64=0 BENCH_MFU=0 \
    BENCH_B1_KERNEL=0 python bench.py >> "$LOG" 2>&1 \
    || say "staged $q rc=$?"
done

say "5. assisted staged A/B at B=1 (ADVICE r3: assisted inherited the
default without its own measurement)"
for q in 0 128; do
  say "   assisted staged=$q"
  timeout 3600 env BENCH_STAGED=$q BENCH_TOKEN_ROWS=192 BENCH_HEADLINE=192 \
    BENCH_B1=1 BENCH_SPEC=1 BENCH_SPEC_B64=0 BENCH_BEAM=0 BENCH_ROWS=0 \
    BENCH_MFU=0 BENCH_B1_KERNEL=0 python bench.py >> "$LOG" 2>&1 \
    || say "assisted staged $q rc=$?"
done

say "capture done — log at $LOG"
