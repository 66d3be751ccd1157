#!/bin/bash
# Round-3 follow-up: runs 02-04 of tools/tpu_battery.sh executed before the
# Mosaic dynamic_update_slice fix landed (commit b56401c) and failed at
# lowering. Wait for the main battery to finish (never two TPU clients at
# once — the axon pool is claim-based), re-run them with the fixed kernel,
# and re-adjudicate SHIPPING.json over the full 01-05 set.
set -u
LOG=/tmp/battery
until grep -q "BATTERY DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}

run 02_pallas BENCH_FACTORIZER=pallas
run 03_pallas_corr5 BENCH_FACTORIZER=pallas BENCH_CORRECTOR=5
run 04_pallas_ls5 BENCH_FACTORIZER=pallas BENCH_LS_TRIALS=5
python tools/adjudicate_battery.py 2>&1 | tee -a "$LOG/summary.log"
echo "REDO DONE $(date)" | tee -a "$LOG/summary.log"
