#!/bin/bash
# Round-3 follow-up #2: A/B the cholinv factorizer (While-loop-free
# per-node inverse Cholesky, commit 2b5be17) on real TPU, and re-price the
# accurate mode with the batch-efficient factorizers (the Pallas kernel
# serializes the scenario grid on the one TensorCore, so run 08's accurate
# pricing overpays by ~250 ms/tick of factorization).
# Waits for tools/battery_redo_pallas.sh to finish first (one TPU client
# at a time — the axon pool is claim-based).
set -u
LOG=/tmp/battery
until grep -q "REDO DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}

# Hot config, batch 512: cholinv vs sequential (01) vs pallas (02 redo).
run cand_cholinv BENCH_FACTORIZER=cholinv
# Hot config, batch 1 on-device latency: all three factorizers
# (08c covered pallas).
run 13_seq_lat1 BENCH_BATCH=1 BENCH_TICKS=10 BENCH_SCAN_TICKS=30
run 14_cholinv_lat1 BENCH_FACTORIZER=cholinv BENCH_BATCH=1 BENCH_TICKS=10 \
    BENCH_SCAN_TICKS=30
# Accurate mode (eqproj=4, Fatrop tolerance), batch 512: price it with the
# batch-efficient factorizers (08 used pallas: 192 solves/s).
run 15_accurate_seq BENCH_EQPROJ=4 BENCH_SQP_ITERS=1 BENCH_ADMM_ITERS=10 \
    BENCH_CORRECTOR=0 BENCH_LS_TRIALS=8 BENCH_FACTORIZER=sequential \
    BENCH_TICKS=10 BENCH_LATENCY_SAMPLES=10
run 16_accurate_cholinv BENCH_EQPROJ=4 BENCH_SQP_ITERS=1 BENCH_ADMM_ITERS=10 \
    BENCH_CORRECTOR=0 BENCH_LS_TRIALS=8 BENCH_FACTORIZER=cholinv \
    BENCH_TICKS=10 BENCH_LATENCY_SAMPLES=10
# Re-adjudicate with the cholinv candidate in the pool.
python tools/adjudicate_battery.py 'cand_*.log' 2>&1 | tee -a "$LOG/summary.log"
echo "ROUND3C DONE $(date)" | tee -a "$LOG/summary.log"
