"""Round-3 TPU batch R — chasing true 1e-6 VARIANCE inside the 1 s budget.

Posterior means are done (≤1e-7 across the df ladder, batch Q2). The
remaining BASELINE gap is variance: vr=1 sits at max 3.4e-6 (se) /
7.5e-6 (composite). The second-order identity says the qform error is
~(W0 residual)², so lifting the W0 solve HIGH → HIGHEST (bf16x3 → bf16x6
GEMMs, ~+0.14 s) should cut the second-order term ~4x — if the result
lands under 1e-6 max we have a documented <1 s configuration meeting the
full BASELINE "mean AND variance to 1e-6" target.

  R1. C1 ladder, vr ∈ {0,1}, var_precision=HIGHEST (the knob now feeds
      the W0 solve in refined-variance mode).

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_r.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from exp_r3_batch_c import c1_double_accuracy

if __name__ == "__main__":
    c1_double_accuracy(
        gp_kwargs={"var_precision": jax.lax.Precision.HIGHEST},
        tag=" W0=HIGHEST",
    )
    print("BATCHR_DONE", flush=True)
