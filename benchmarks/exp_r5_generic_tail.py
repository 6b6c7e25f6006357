"""Round-5 TPU batch — the two generic done-bar rows the v3 run lost to
the df-kss diag runtime OOM (general-ν matern + the fused-se control),
rerun on the multiplicity-aware adaptive row chunk
(kernels/df_plan._row_chunk_for_trace: the first probe budgeted only the
single largest rows-proportional intermediate; the barrier-guarded df
trace keeps ~8x-per-primitive of them live, so a (512, 512, 384) Bessel
diag chunk still OOM'd with ~20 384 MB temps resident).

Run on the TPU host: timeout 9000 python benchmarks/exp_r5_generic_tail.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exp_r5_generic_acc2 import matern_nu64, run


def se64(a, b):
    return np.exp(-((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
                  / (2 * 0.49))


def main():
    from stpy_tpu.kernels import KernelFunction

    run("matern_nu1.2",
        lambda: KernelFunction(kernel_name="matern", nu=1.2, gamma=0.8,
                               d=8),
        lambda a, b: matern_nu64(a, b, 0.8, 1.2))
    run("se (fused)",
        lambda: KernelFunction(kernel_name="squared_exponential",
                               gamma=0.7, d=8),
        se64, expect_generic=False)
    print("R5_GENERIC_TAIL_DONE", flush=True)


if __name__ == "__main__":
    main()
