#!/bin/bash
# Round-3 follow-up #7: clean re-runs with the committed evaluate-reuse
# (f274189) for attribution, the corr3 middle point, and the N=30 horizon
# number with the best factorizer. Chained behind 3g.
set -u
LOG=/tmp/battery
until grep -q "ROUND3G DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}
run cand_pb_corr5_v2 BENCH_FACTORIZER=cholinv_pb BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5
run cand_pb_corr3_v2 BENCH_FACTORIZER=cholinv_pb BENCH_CORRECTOR=3 \
    BENCH_LS_TRIALS=5
run 23_n30_cholinv_pb BENCH_NODES=30 BENCH_FACTORIZER=cholinv_pb \
    BENCH_TICKS=5 BENCH_LATENCY_SAMPLES=5
run 24_aba_cholinv_pb BENCH_DYNAMICS=whole_body_aba \
    BENCH_FACTORIZER=cholinv_pb
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
echo "ROUND3H DONE $(date)" | tee -a "$LOG/summary.log"
