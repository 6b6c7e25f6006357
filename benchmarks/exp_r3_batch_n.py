"""Round-3 TPU batch N — the landmark-sketch Rayleigh EVD preconditioner
(`rayleigh_nystrom_precond`, now the IterativeGP/bbmm default) at 65k.

Batch L measured the one-pass GAUSSIAN sketch: rank 512 leaves the
sum-kernel PCG stalled (Y = K·Ω squares the spectral decay, so the range
starves mid-spectrum coverage), rank 2048 converges in 41 iters, rank
4096 is at 4.2e-6 after 400 iters — non-monotone again. The landmark
construction takes the range from actual kernel columns (batch H2 proved
rank-512 coverage: 65 iters via the QR-Nyström lift) and the eigenvalues
from the junk-proof Rayleigh compression (batch K showed the lift's
estimates go NEGATIVE at rank 2048/4096).

  N1. Same C4 configuration and ranks as batches H/H2/L — the done-bar
      is rank-MONOTONE iterations with every rank converging.
  N2. `fit_evidence_lazy` 65k hyperfit, precond_rank=512, E4 config.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_n.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp


def n1_rank_sweep():
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
        print(f"N1 rayleigh-nystrom rank={rank}: {gp.cg_iterations} iters, "
              f"residual {float(gp.cg_residual):.2e}, {wall:.1f}s "
              f"(inc compile)", flush=True)


def n2_hyperfit():
    from exp_r3_batch_e import e1_hyperfit_precond

    e1_hyperfit_precond(rank=512)


if __name__ == "__main__":
    n1_rank_sweep()
    n2_hyperfit()
    print("BATCHN_DONE", flush=True)
