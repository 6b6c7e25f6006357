#!/bin/bash
# Eleventh sequential TPU queue for round 5 — final reorder after the
# generic-interpreter matern row KILLED the TPU worker (the r4
# monolithic-program failure mode: 205 chained df map steps in one
# program). The dedicated matern_gen family measurement moves first —
# it is now the only way to run general-nu at n=8k on this chip — then
# the remaining lazy-double-var done-bars, the dense-32k rows, bench.
# Waits for the in-flight ldv_se24k process (PID $1).
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p $LOG
WAITPID=${1:-0}
while kill -0 "$WAITPID" 2>/dev/null; do sleep 15; done
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue11.log
  timeout 5400 python "$@" > $LOG/$name.log 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a $LOG/queue11.log
}
run matern_gen benchmarks/exp_r5_matern_gen.py
run ldv_comp16k benchmarks/exp_r5_lazy_double_var.py comp16k
run ldv_mesh benchmarks/exp_r5_lazy_double_var.py mesh
run ldv_n65k benchmarks/exp_r5_lazy_double_var.py n65k
run dense32k_se benchmarks/exp_r5_dense32k_double.py se
run dense32k_mem benchmarks/exp_r5_dense32k_mem.py
run dense32k_comp benchmarks/exp_r5_dense32k_double.py comp
run bench_final bench.py
echo "QUEUE11_DONE" | tee -a $LOG/queue11.log
