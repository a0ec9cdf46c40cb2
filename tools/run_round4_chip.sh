#!/usr/bin/env bash
# Round-4 chip measurement batch (VERDICT r3 items 1, 2, 3, 4, 7 + the
# round-3 pending VGA row). The TPU tunnel has been flaky for hours at a
# time — this script captures EVERY pending measurement in one tunnel-up
# window, each stage bounded and logged, failures skipped (rerun later).
#
#   bash tools/run_round4_chip.sh [outdir]   # default artifacts/r04
#
# Stage order: cheapest/most-important first, so a tunnel drop mid-run
# still leaves the bench artifact.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r04}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/progress.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
  local rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/progress.log"
  tail -3 "$OUT/$name.log" || true
}

# 1. the driver headline (retry driver handles transient init failures).
# The outer timeout must cover bench.py's own WORST-CASE retry schedule
# (5 attempts x FACEJAX_BENCH_ATTEMPT_TIMEOUT=1800s + 180s backoff),
# or this wrapper SIGKILLs the driver mid-retry and recreates the
# wiped-round failure it exists to prevent.
run bench 9600 python bench.py
# 2. gallery-dtype real-chip rows (VERDICT item 2): 1M-row match per dtype
for d in f32 bf16 int8; do
  run gallery_$d 2400 python tools/perf_gallery_scale.py --dtype $d
  run gallery_${d}_ms16 2400 python tools/perf_gallery_scale.py \
      --dtype $d --streams 16
done
# 3. adversarial NMS bound (item 4)
run nms_adversarial 1800 python tools/perf_nms_adversarial.py --reps 64
# 4. backward roofline + counter-experiments (item 3)
run backward_b64 3000 env PL_BATCH=64 python tools/perf_backward.py
run train_stock 2400 python tools/perf_train.py --steps 8
run train_im2col 2400 python tools/perf_train.py --steps 8 --bwd-im2col
# 5. flagship extraction rooflines + headline throughput (item 7)
run extract_all 3000 python tools/perf_extract.py --batch 64 128 256
run layers_lc29 2400 env PL_BATCH=128 python tools/perf_layers.py \
    --ladder lightcnn29
run layers_efm342 2400 env PL_BATCH=256 python tools/perf_layers.py \
    --ladder efmnet342
# 6. round-3 pending VGA serving row
run pipeline_vga 2400 python tools/perf_pipeline.py --frame-size 480 640 \
    --frames 32 --streams 8
echo "ALL DONE $(date -u +%H:%M:%SZ)" | tee -a "$OUT/progress.log"
