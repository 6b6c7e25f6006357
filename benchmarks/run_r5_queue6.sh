#!/bin/bash
# Sixth sequential TPU queue for round 5: lazy-double-var stages, one
# process each (OOM isolation). Waits for queue 5.
cd /root/repo
LOG=benchmarks/logs_r5
while ! grep -q QUEUE5_DONE $LOG/queue5.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue6.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue6.log
}
run ldv_se24k benchmarks/exp_r5_lazy_double_var.py se24k
run ldv_comp16k benchmarks/exp_r5_lazy_double_var.py comp16k
run ldv_n65k benchmarks/exp_r5_lazy_double_var.py n65k
run ldv_mesh benchmarks/exp_r5_lazy_double_var.py mesh
echo "QUEUE6_DONE" | tee -a $LOG/queue6.log
