#!/bin/bash
# Third sequential TPU queue for round 5: re-runs after the r5 code fixes
# (batched-Armijo MAP linesearch; mixed HIGHEST/HIGH W0 default; repaired
# generic-acc / lazy-double-var / panels scripts).
cd /root/repo
LOG=benchmarks/logs_r5
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue3.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue3.log
}
run config4_v3 benchmarks/exp_r5_config4.py
run serving3 benchmarks/exp_r5_serving3.py
run panels_v2 benchmarks/exp_r5_panels.py
run lazy_double_var_v2 benchmarks/exp_r5_lazy_double_var.py
run generic_acc2_v2 benchmarks/exp_r5_generic_acc2.py
echo "QUEUE3_DONE" | tee -a $LOG/queue3.log
