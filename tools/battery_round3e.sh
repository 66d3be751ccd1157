#!/bin/bash
# Round-3 follow-up #4: quality-config candidates and the ABA re-measure.
# The redo A/B showed corrector5+ls5 costs only ~15 ms/tick on top of the
# same factorizer (594 vs 579 ms/tick pallas) while cutting violation
# 0.75 -> 0.31 — so price it on the batch-efficient factorizers.
# ABA re-runs pick up the chol_inv mass-matrix solve (commit 895971c).
# Chained behind tools/battery_round3d.sh (one TPU client at a time).
set -u
LOG=/tmp/battery
until grep -q "ROUND3D DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}

# Quality candidates: corrector=5 on the batch-efficient factorizers.
run cand_seq_corr5 BENCH_FACTORIZER=sequential BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5
run cand_cholinv_corr5 BENCH_FACTORIZER=cholinv BENCH_CORRECTOR=5 \
    BENCH_LS_TRIALS=5
# ls-trim alone on sequential (VERDICT item 7).
run cand_seq_ls5 BENCH_FACTORIZER=sequential BENCH_LS_TRIALS=5
# ABA gate re-measure with the While-loop-free mass-matrix solve.
run 17_aba_linv BENCH_DYNAMICS=whole_body_aba
# Re-adjudicate over the full candidate pool.
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
echo "ROUND3E DONE $(date)" | tee -a "$LOG/summary.log"
