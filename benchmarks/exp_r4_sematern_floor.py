"""Round-4 TPU batch — decompose the se+matern residual variance error
under the ozaki qform (5.26e-6 max vs the 1e-6 bar; se/matern32 pass at
6.2e-7/9.3e-7). Reuses exp_r4_varfloor's (a)/(b)/(c) decomposition, plus
an ozaki+HIGHEST-W0 full-pipeline run to probe the (c) identity bias.

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_sematern_floor.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from exp_r3_batch_c import matern64, sq64
from exp_r4_varfloor import decompose
from exp_r4_qform_fix import run


def main():
    from stpy_tpu.kernels import KernelFunction
    D = 8
    decompose(
        "se+matern",
        lambda: (KernelFunction(kernel_name="squared_exponential",
                                gamma=0.5, d=D)
                 + KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5,
                                  d=D)),
        lambda a, b: (np.exp(-sq64(a, b) / (2 * 0.25))
                      + matern64(sq64(a, b), 1.1, 2.5)),
        "gamma=1.1 inexact",
    )
    run("se+matern", "ozaki", jax.lax.Precision.HIGHEST)
    print("R4_SEMATERN_FLOOR_DONE", flush=True)


if __name__ == "__main__":
    main()
