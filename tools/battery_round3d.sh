#!/bin/bash
# Round-3 follow-up #3: factorize-only microbench A/B (blocked vs cholinv
# bases vs pallas) and a fresh in-context tick anatomy, on real TPU.
# Chained behind tools/battery_round3c.sh (one TPU client at a time).
set -u
LOG=/tmp/battery
until grep -q "ROUND3C DONE" "$LOG/summary.log" 2>/dev/null; do sleep 60; done

echo "=== microbench_fac start $(date) ===" | tee -a "$LOG/summary.log"
timeout 3600 env MB_BATCH=512 MB_NODES=14 MB_S=112 \
  python tools/microbench_fac.py > "$LOG/microbench_fac.log" 2>&1
echo "=== microbench_fac rc=$? $(date) ===" | tee -a "$LOG/summary.log"
tail -12 "$LOG/microbench_fac.log" | tee -a "$LOG/summary.log"

for f in sequential cholinv; do
  echo "=== anatomy_$f start $(date) ===" | tee -a "$LOG/summary.log"
  timeout 3600 env BENCH_FACTORIZER=$f \
    python tools/profile_cumulative.py > "$LOG/anatomy_$f.log" 2>&1
  echo "=== anatomy_$f rc=$? $(date) ===" | tee -a "$LOG/summary.log"
  tail -12 "$LOG/anatomy_$f.log" | tee -a "$LOG/summary.log"
done
# ABA tick anatomy (VERDICT #4: where do its extra ~240 ms/tick go?)
echo "=== anatomy_aba start $(date) ===" | tee -a "$LOG/summary.log"
timeout 3600 env BENCH_DYNAMICS=whole_body_aba \
  python tools/profile_cumulative.py > "$LOG/anatomy_aba.log" 2>&1
echo "=== anatomy_aba rc=$? $(date) ===" | tee -a "$LOG/summary.log"
tail -12 "$LOG/anatomy_aba.log" | tee -a "$LOG/summary.log"
echo "ROUND3D DONE $(date)" | tee -a "$LOG/summary.log"
