#!/bin/bash
# Fourth sequential TPU queue for round 5: serving-wall recovery probe
# (jitter_ladder=False closing rows) + the composite stage block in its
# own process. Waits for queue 3.
cd /root/repo
LOG=benchmarks/logs_r5
while ! grep -q QUEUE3_DONE $LOG/queue3.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue4.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue4.log
}
run serving4_table benchmarks/exp_r5_serving4.py table
run serving4_stages benchmarks/exp_r5_serving4.py stages
echo "QUEUE4_DONE" | tee -a $LOG/queue4.log
