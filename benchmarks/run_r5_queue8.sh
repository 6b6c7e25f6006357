#!/bin/bash
# Eighth sequential TPU queue for round 5: memory probe + retry of the
# 32k fold_noise run (split fit/mean_std calls after the fused-program
# runtime OOM), the generic-table tail rows (multiplicity-aware chunk
# fix), the composite 32k dense-double (strip_fold), then the FINAL
# five-config closing table + driver bench on settled defaults.
# Waits for queue 7.
cd /root/repo
LOG=benchmarks/logs_r5
while ! grep -q QUEUE7_DONE $LOG/queue7.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue8.log
  timeout 9000 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue8.log
}
run dense32k_mem benchmarks/exp_r5_dense32k_mem.py
run dense32k_se2 benchmarks/exp_r5_dense32k_double.py se
run generic_tail benchmarks/exp_r5_generic_tail.py
run dense32k_comp benchmarks/exp_r5_dense32k_double.py comp
run run_all_final benchmarks/run_all.py
run bench_final bench.py
echo "QUEUE8_DONE" | tee -a $LOG/queue8.log
