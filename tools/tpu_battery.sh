#!/bin/bash
# Unattended round-3 TPU validation battery (VERDICT items 1,2,3,4,7).
# Run after tools/tpu_wait.sh reports the device healthy:
#   bash tools/tpu_wait.sh && bash tools/tpu_battery.sh
# Each bench run logs to /tmp/battery/<name>.log; one-line JSON results are
# appended to /tmp/battery/summary.log. The persistent compilation cache
# (/tmp/jax_cache, enabled inside bench.py) makes later repeats cheap.
#
# The 75-min per-run timeout is a wedge backstop only: killing a TPU client
# mid-compute can wedge the axon device (CLAUDE.md), but a bench run hung
# that long means the device is already wedged and the kill loses nothing.
set -u
LOG=/tmp/battery
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 4500 env "$@" python bench.py > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc $(date) ===" | tee -a "$LOG/summary.log"
}

# 1. Re-verify the round-2 default config on hardware (and warm the cache).
run 01_default
# 2. THE round item: Pallas VMEM factorizer, first-ever real-TPU run.
run 02_pallas BENCH_FACTORIZER=pallas
# 3. Quality config: corrector=5 halved gait-transition spikes on CPU.
run 03_pallas_corr5 BENCH_FACTORIZER=pallas BENCH_CORRECTOR=5
# 4. Line-search trim (CPU-verified quality-neutral).
run 04_pallas_ls5 BENCH_FACTORIZER=pallas BENCH_LS_TRIALS=5
run 05_pallas_corr5_ls5 BENCH_FACTORIZER=pallas BENCH_CORRECTOR=5 BENCH_LS_TRIALS=5
# Guarded default flip: encode the VERDICT decision rule over runs 01-05
# and write SHIPPING.json (bench.py picks it up) on a real-TPU pass.
python tools/adjudicate_battery.py 2>&1 | tee -a "$LOG/summary.log"

# 5. whole_body_aba gate (>=1.5k solves/s from 707, round-1 task 5).
run 06_aba BENCH_DYNAMICS=whole_body_aba
run 07_aba_pallas BENCH_DYNAMICS=whole_body_aba BENCH_FACTORIZER=pallas
# 6. Price the accurate mode (VERDICT 3): frontier-sweep winner =
#    SQPConfig.accurate() (b2g N14 CPU: mean 1.7e-4, worst 2.7e-4;
#    ~10x cheaper than the round-2 golden sqp6/admm400/eqproj2).
#    (knobs pinned so an already-written SHIPPING.json can't skew the
#    preset measurement)
run 08_accurate BENCH_EQPROJ=4 BENCH_SQP_ITERS=1 BENCH_ADMM_ITERS=10 \
    BENCH_CORRECTOR=0 BENCH_LS_TRIALS=8 \
    BENCH_FACTORIZER=pallas BENCH_TICKS=10 BENCH_LATENCY_SAMPLES=10
#    ... and its single-scenario latency vs the reference's 10 ms budget
#    (run_mpc loop at Fatrop tol; BASELINE.md).
#    BENCH_SCAN_TICKS runs the on-device lax.scan rollout too, whose
#    scan_ms_per_tick amortizes the tunnel round trip — the honest
#    on-robot latency number.
run 08b_accurate_lat1 BENCH_EQPROJ=4 BENCH_SQP_ITERS=1 BENCH_ADMM_ITERS=10 \
    BENCH_CORRECTOR=0 BENCH_LS_TRIALS=8 \
    BENCH_FACTORIZER=pallas BENCH_BATCH=1 BENCH_TICKS=10 BENCH_SCAN_TICKS=30
#    ... same on-device latency for the HOT config (headline per-tick).
run 08c_hot_lat1 BENCH_FACTORIZER=pallas BENCH_BATCH=1 BENCH_TICKS=10 \
    BENCH_SCAN_TICKS=30
# 7. Horizon parallelism at long horizons (VERDICT 2.3 partial): the
#    cyclic-reduction factorizer loses at N=14; measure the crossover and
#    the pallas kernel's VMEM fit at N=30.
run 09_n30_seq BENCH_NODES=30 BENCH_TICKS=5 BENCH_LATENCY_SAMPLES=5
run 10_n30_cyclic BENCH_NODES=30 BENCH_FACTORIZER=cyclic BENCH_TICKS=5 \
    BENCH_LATENCY_SAMPLES=5
run 11_n30_pallas BENCH_NODES=30 BENCH_FACTORIZER=pallas BENCH_TICKS=5 \
    BENCH_LATENCY_SAMPLES=5
echo "BATTERY DONE $(date)" | tee -a "$LOG/summary.log"
