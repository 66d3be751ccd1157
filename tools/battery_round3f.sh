#!/bin/bash
# Round-3 follow-up #5: the cholinv_pb factorizer (lane-batched Pallas
# base kernel, commit e53eaf5) on real TPU — hot config, quality config,
# and batch-1 latency — then the final adjudication over all candidates.
# Chained behind tools/battery_round3e.sh (one TPU client at a time).
set -u
LOG=/tmp/battery
until grep -q "ROUND3E DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}

run cand_cholinv_pb BENCH_FACTORIZER=cholinv_pb
run cand_cholinv_pb_corr5 BENCH_FACTORIZER=cholinv_pb BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5
run 18_cholinv_pb_lat1 BENCH_FACTORIZER=cholinv_pb BENCH_BATCH=1 \
    BENCH_TICKS=10 BENCH_SCAN_TICKS=30
run 19_accurate_cholinv_pb BENCH_EQPROJ=4 BENCH_SQP_ITERS=1 \
    BENCH_ADMM_ITERS=10 BENCH_CORRECTOR=0 BENCH_LS_TRIALS=8 \
    BENCH_FACTORIZER=cholinv_pb BENCH_TICKS=10 BENCH_LATENCY_SAMPLES=10
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
echo "ROUND3F DONE $(date)" | tee -a "$LOG/summary.log"
