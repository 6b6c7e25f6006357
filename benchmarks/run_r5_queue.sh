#!/bin/bash
# Sequential TPU measurement queue for round-5 VERDICT tasks.
# One TPU process at a time (tunnel constraint).
cd /root/repo
LOG=benchmarks/logs_r5
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue.log
}
run config4 benchmarks/exp_r5_config4.py
run generic_acc benchmarks/exp_r4_generic_acc.py
run serving benchmarks/exp_r5_serving.py
run serving2 benchmarks/exp_r5_serving2.py
run lazy_double_var benchmarks/exp_r5_lazy_double_var.py
run panels benchmarks/exp_r5_panels.py
echo "QUEUE_DONE" | tee -a $LOG/queue.log
