#!/bin/bash
# Seventh sequential TPU queue for round 5 (this replaces the paused
# queue 6, which it includes): generic done-bar rerun on the three
# generic-tier fixes (adaptive trace chunk, plan-aware ir default, df
# k**), the fold_noise 32k dense-double capability row, then the
# lazy-double-var stages one process each (OOM isolation). run_all +
# bench (queue 5) launch manually afterwards on final defaults.
cd /root/repo
LOG=benchmarks/logs_r5
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue7.log
  timeout 9000 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue7.log
}
run generic_acc2_v3 benchmarks/exp_r5_generic_acc2.py
run dense32k_double benchmarks/exp_r5_dense32k_double.py
run ldv_se24k benchmarks/exp_r5_lazy_double_var.py se24k
run ldv_comp16k benchmarks/exp_r5_lazy_double_var.py comp16k
run ldv_n65k benchmarks/exp_r5_lazy_double_var.py n65k
run ldv_mesh benchmarks/exp_r5_lazy_double_var.py mesh
echo "QUEUE7_DONE" | tee -a $LOG/queue7.log
