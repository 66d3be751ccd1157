#!/bin/bash
# Round-3 final batch: ls-trim on the best hot config, final adjudication,
# and a driver-mirror run (plain bench.py on the final SHIPPING.json).
set -u
LOG=/tmp/battery
until grep -q "ROUND3H DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}
run cand_pb_ls5 BENCH_FACTORIZER=cholinv_pb BENCH_LS_TRIALS=5
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
# Driver mirror: exactly what BENCH_r03 will run (defaults + SHIPPING.json).
run 99_driver_mirror
echo "ROUND3I DONE $(date)" | tee -a "$LOG/summary.log"
