"""Round-3 TPU batch E — preconditioned matrix-free tier at n = 65,536.

  E1. `fit_evidence_lazy` with `precond_rank=512` (randomized-Nystrom
      preconditioner on both the alpha and probe CG solves) vs the r2
      unpreconditioned run (407 s inc compile, ~12 s/warm step,
      RESULTS.md) — identical data/start/stop config to
      exp_lazy_hyperfit.py.
  E2. Posterior CG solve (IterativeGP, lazy Pallas Gram matvec) with the
      Nystrom preconditioner: iterations + warm wall vs the r1/r2
      headline (182 iters, ~7 s warm).

Run on the TPU host: timeout 5400 python benchmarks/exp_r3_batch_e.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import traceback

import numpy as np
import jax
import jax.numpy as jnp

N, D = 65536, 4
TRUE_NOISE = 0.1


def _data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(
        (np.sin(3 * np.asarray(x)[:, 0]) + np.cos(2 * np.asarray(x)[:, 1])
         + TRUE_NOISE * rng.standard_normal(N)),
        jnp.float32,
    )
    return x, y


def e1_hyperfit_precond(rank=512):
    from stpy_tpu.parallel import fit_evidence_lazy

    x, y = _data()
    t0 = time.perf_counter()
    out = fit_evidence_lazy(
        x, y, gamma0=1.0, noise0=0.3, steps=25, lr=0.15, probes=64,
        cg_tol=1e-5, cg_maxiter=300, probe_tol=1e-2, probe_maxiter=60,
        tol=1e-2, final_value=False, verbose=True, precond_rank=rank,
    )
    wall = time.perf_counter() - t0
    print(f"E1 n={N} rank={rank}: gamma {out['gamma']:.4f} "
          f"noise {out['noise']:.4f} in {out['steps_run']} steps, "
          f"{wall:.1f}s total (inc compile)", flush=True)


def e2_posterior_cg(rank=512):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    x, y = _data()
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    for r in (0, rank):
        gp = IterativeGP(k, s=TRUE_NOISE, lazy=True, tol=1e-6, maxiter=400,
                         precond_rank=r)
        t0 = time.perf_counter()
        gp.fit_gp(x, y.reshape(-1, 1))
        float(jnp.sum(jnp.abs(gp.A)))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        gp.fit_gp(x, (y * 1.001).reshape(-1, 1))
        float(jnp.sum(jnp.abs(gp.A)))
        warm = time.perf_counter() - t0
        print(f"E2 n={N} rank={r}: {gp.cg_iterations} iters, "
              f"residual {gp.cg_residual:.1e}, cold {cold:.1f}s, "
              f"warm {warm:.1f}s", flush=True)


SECTIONS = {"E1": e1_hyperfit_precond, "E2": e2_posterior_cg}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    for nm in names:
        print(f"\n=== {nm} ===", flush=True)
        try:
            SECTIONS[nm]()
        except Exception:
            traceback.print_exc()
