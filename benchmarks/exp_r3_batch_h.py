"""Round-3 TPU batch H — Nyström rank scaling for the 65k sum-kernel PCG.

The on-device diagnostic (exp_r3_diag_precond.py) cleared every suspect
stage — TPU eigh matches host f64 to 2e-7 on the top eigenvalues, M⁻¹ is
PSD and symmetric, matvec error is plain f32 accumulation noise — leaving
RANK COVERAGE as the stall's cause: the part of the kernel spectrum above
σ² grows ~linearly with n, so rank 512 (13 iters at n=8k) leaves the
n=65,536 system stalled at ~2e-1. This batch sweeps the Nyström rank on
the exact C4 configuration (se γ=0.6 + matern32 γ=1.0, s=0.2):

  H1. rank ∈ {512, 2048, 4096}: CG iterations + warm fit wall.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_h.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    n, d = 65536, 3
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1]) + 0.1 * jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32)
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=d)
         + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=d))
    for rank in (512, 2048, 4096):
        gp = IterativeGP(k, s=0.2, lazy=True, tol=1e-6, maxiter=400,
                         precond_rank=rank)
        t0 = time.perf_counter()
        gp.fit_gp(x, y)
        _ = float(jnp.sum(jnp.abs(gp.A)))
        wall = time.perf_counter() - t0
        print(f"H1 nystrom rank={rank}: {gp.cg_iterations} iters, "
              f"residual {float(gp.cg_residual):.2e}, {wall:.1f}s "
              f"(inc compile)", flush=True)


if __name__ == "__main__":
    main()
