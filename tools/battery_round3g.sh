#!/bin/bash
# Round-3 follow-up #6: batched on-device scan rollout with the winning
# factorizer (relay-free throughput), chained behind 3f.
set -u
LOG=/tmp/battery
until grep -q "ROUND3F DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}
run 20_cholinv_scan512 BENCH_FACTORIZER=cholinv BENCH_TICKS=5 \
    BENCH_LATENCY_SAMPLES=5 BENCH_SCAN_TICKS=30 BENCH_SCAN_REPS=2
run 21_corr5_scan512 BENCH_FACTORIZER=cholinv BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5 BENCH_TICKS=5 BENCH_LATENCY_SAMPLES=5 \
    BENCH_SCAN_TICKS=30 BENCH_SCAN_REPS=2
echo "ROUND3G DONE $(date)" | tee -a "$LOG/summary.log"
