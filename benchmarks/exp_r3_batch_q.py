"""Round-3 TPU batch Q — the accuracy ladder after the df-sqrt fix and
the refinement-step knob.

Two library changes to validate together:
  * multiply-only Newton corrections in the df matern sqrt (the VPU's
    ~2^-8 divide floored the (hi, lo) pair at 5.9e-8 — batch P run 1;
    the refined-reciprocal rework targets ~2e-12). If it works, the
    matern entry error drops 5.4e-8 → ~1e-10-class and the composite
    se+matern posterior-mean plateau (1.25e-6, batches G/L3) falls
    under the 1e-6 VERDICT bar.
  * `df_refine_steps` (batch M measured ir=1 == ir=3 exactly on the se
    ladder; each step costs ~0.08 s of the ≤0.7 s vr=1 budget).

  Q1. C1 ladder (se / matern32 / se+matern, vr ∈ {0,1}) at
      df_refine_steps ∈ {1, 2} — accuracy AND warm wall per config.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_q.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_r3_batch_c import c1_double_accuracy

if __name__ == "__main__":
    for steps in (1, 2):
        print(f"=== Q1 df_refine_steps={steps} ===", flush=True)
        c1_double_accuracy(gp_kwargs={"df_refine_steps": steps},
                           tag=f" ir={steps}")
    print("BATCHQ_DONE", flush=True)
