"""Round-3 TPU batch D — double-mode re-measurement after the exact-EFT
GEMV (ops/compensated.gemv_df replaces the chunk-compensated MXU GEMV on
the df fit-residual and mean paths) and the qform VMEM fix (block_k=256).

  D1. double vr∈{0,1} at n=16k for se / matern32 / se+matern: warm
      fit+predict wall + mean/var accuracy vs host f64
      (VERDICT item 4 bar: mean ≤1e-6; item 6 bar: vr=1 ≤0.7 s,
      var max ≤5e-6).

Run on the TPU host: timeout 5400 python benchmarks/exp_r3_batch_d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_r3_batch_c import c1_double_accuracy

if __name__ == "__main__":
    print("=== D1 ===", flush=True)
    c1_double_accuracy()
