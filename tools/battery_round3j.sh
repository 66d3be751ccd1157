#!/bin/bash
# Round-3 last batch: close the 0.44% quality-gate gap — ls4 variant and
# a corr5 variance re-run — then the final adjudication.
set -u
LOG=/tmp/battery
until grep -q "ROUND3I DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}
run cand_pb_corr5_ls4 BENCH_FACTORIZER=cholinv_pb BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=4
run cand_pb_corr5_r2 BENCH_FACTORIZER=cholinv_pb BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
echo "ROUND3J DONE $(date)" | tee -a "$LOG/summary.log"
