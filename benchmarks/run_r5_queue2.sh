#!/bin/bash
# Second sequential TPU queue for round 5: waits for queue 1's QUEUE_DONE,
# then runs the measurement re-runs that depend on r5 code changes
# (generic-acc v2 script fixes; config-4 backtracking MAP solver).
cd /root/repo
LOG=benchmarks/logs_r5
while ! grep -q QUEUE_DONE $LOG/queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue2.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue2.log
}
run generic_acc2 benchmarks/exp_r5_generic_acc2.py
run config4_v2 benchmarks/exp_r5_config4.py
echo "QUEUE2_DONE" | tee -a $LOG/queue2.log
