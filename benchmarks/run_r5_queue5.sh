#!/bin/bash
# Fifth sequential TPU queue for round 5: the closing five-config table
# and the driver bench on FINAL r5 defaults (VERDICT r5 task 9's repeats
# discipline). Waits for queue 4.
cd /root/repo
LOG=benchmarks/logs_r5
while ! grep -q QUEUE4_DONE $LOG/queue4.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue5.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue5.log
}
run run_all_final benchmarks/run_all.py
run bench_final bench.py
echo "QUEUE5_DONE" | tee -a $LOG/queue5.log
