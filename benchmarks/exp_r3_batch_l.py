"""Round-3 TPU batch L — validate the two-pass randomized EVD
preconditioner (`randomized_eig_precond`) on the real chip.

Batch K found the QR-Nyström lift's failure mode at n=65,536: the rank
2048/4096 compressions carry NEGATIVE tail eigenvalue estimates
(-1.7e-4 / -9.0e-4 against σ² = 4e-2) — junk estimates from the
inverse-amplified factor B = C·W^{-1/2} that made the rank sweep
non-monotone (512 converges in 65 iters, 2048 stalls, 4096 converges).
The two-pass EVD takes eigenvalues from a Rayleigh compression QᵀKQ, so
estimates interlace K's true spectrum and the construction is stable at
any rank.

  L1. 65k sum-kernel (se γ=0.6 + matern32 γ=1.0, s=0.2) PCG rank sweep
      {512, 2048, 4096} through IterativeGP — must be rank-MONOTONE in
      iterations (the done-bar batch H2 could not meet).
  L2. `fit_evidence_lazy` at 65k with precond_rank=512 — the bbmm tier
      now constructs the EVD preconditioner from the fused sum-matmat
      (two Gram sweeps) instead of a landmark cross-Gram; confirm the
      fit still lands on (γ≈1.0, σ≈0.12) at the E4 config and record
      the wall delta vs E4's 261 s.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_l.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp


def l1_rank_sweep():
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
        print(f"L1 evd rank={rank}: {gp.cg_iterations} iters, "
              f"residual {float(gp.cg_residual):.2e}, {wall:.1f}s "
              f"(inc compile)", flush=True)


def l2_hyperfit():
    from exp_r3_batch_e import e1_hyperfit_precond

    e1_hyperfit_precond(rank=512)


def l3_accuracy_recheck():
    """C1 double-mode ladder rerun (disk-cached f64 references) — batch G
    predates the df matern sqrt second Newton step (5fcc717); batch I3's
    decomposition showed composite mean total ~9.1e-7 after it, so the
    VERDICT item-4 ≤1e-6 composite bar may now be met. Measure properly."""
    from exp_r3_batch_c import c1_double_accuracy

    c1_double_accuracy()


if __name__ == "__main__":
    l1_rank_sweep()
    l2_hyperfit()
    l3_accuracy_recheck()
    print("BATCHL_DONE", flush=True)
