#!/bin/bash
# Tenth sequential TPU queue for round 5 — reordered remainder of queue
# 9 (generic_tail dropped: this session's generic_acc2 run carries all
# its rows). Waits for the in-flight generic_acc2 process (PID $1) to
# release the chip, then: the lazy-double-var done-bars (VERDICT tasks
# 4/5), the dense-32k capability rows, the dedicated df matern_gen
# measurement (routing flipped this session), and the driver bench.
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p $LOG
WAITPID=${1:-0}
while kill -0 "$WAITPID" 2>/dev/null; do sleep 20; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue10.log
  timeout 7200 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue10.log
}
run ldv_se24k benchmarks/exp_r5_lazy_double_var.py se24k
run ldv_comp16k benchmarks/exp_r5_lazy_double_var.py comp16k
run ldv_n65k benchmarks/exp_r5_lazy_double_var.py n65k
run ldv_mesh benchmarks/exp_r5_lazy_double_var.py mesh
run dense32k_mem benchmarks/exp_r5_dense32k_mem.py
run dense32k_se benchmarks/exp_r5_dense32k_double.py se
run dense32k_comp benchmarks/exp_r5_dense32k_double.py comp
run matern_gen benchmarks/exp_r5_matern_gen.py
run bench_final bench.py
echo "QUEUE10_DONE" | tee -a $LOG/queue10.log
