"""Round-3 TPU batch AA — the matrix-free double tier + final ladder.

  AA0. Re-measure the C1 precision ladder at the SHIPPED defaults
       (df_refine_steps=1 after batch Y) — the final RESULTS.md table.
  AA1. IterativeGP(precision="double") at n=16,384 against the cached
       f64 host references: the lazy refined mean must land in the same
       ≤1e-7 class as the dense double tier (it shares the df Gram
       arithmetic; only the inner solver differs: PCG vs Cholesky).
  AA2. n=65,536 (beyond one chip's dense HBM budget): fit wall, exact
       df refinement residuals (the accuracy evidence at scales where no
       f64 host reference is computable — ‖α−α*‖ ≤ ‖r‖/σ²), and the df
       mean GEMV wall on 2048 test points.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_aa.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_r3_batch_c import (acc, c1_double_accuracy, force, host_reference,
                            matern64, sq64, timed)


def aa1_lazy_double_16k(n=16384, d=8, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))

    cases = [
        ("se", lambda: KernelFunction(kernel_name="squared_exponential",
                                      gamma=0.5, d=d),
         lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25))),
        ("se+matern", lambda: (
            KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
            + KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5, d=d)),
         lambda a, b: (np.exp(-sq64(a, b) / (2 * 0.25))
                       + matern64(sq64(a, b), 1.1, 2.5))),
    ]
    for name, mk, k64 in cases:
        mu64, _ = host_reference(k64, xh, yh, xt, s, cache=f"c1_{name}_{n}")
        for prec, steps in (("single", 0), ("double", 2)):
            try:
                gp = IterativeGP(mk(), s=s, lazy=True, tol=1e-6,
                                 maxiter=400, precond_rank=512,
                                 precision=prec, df_refine_steps=steps)
                w_fit, _ = timed(lambda: gp.fit_gp(x, y))
                w_mu, mu = timed(lambda: gp.mean(xtj))
                m = (np.max(np.abs(np.asarray(mu, np.float64).ravel() - mu64))
                     / np.max(np.abs(mu64)))
                res = getattr(gp, "df_residuals", None)
                print(f"AA1 {name:10s} {prec:6s} fit {w_fit:6.1f}s "
                      f"(cg {gp.cg_iterations} it) mean {w_mu:6.1f}s  "
                      f"mean rel {m:.2e}  df_resids "
                      f"{['%.1e' % r for r in (res or [])]}", flush=True)
            except Exception:
                traceback.print_exc()


def aa2_lazy_double_65k(n=65536, d=8, s=0.2, t=2048):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1]) + 0.1 * jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (t, d)), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=d))
    try:
        gp = IterativeGP(k, s=s, lazy=True, tol=1e-6, maxiter=300,
                         precond_rank=512, precision="double",
                         df_refine_steps=2)
        w_fit, _ = timed(lambda: gp.fit_gp(x, y))
        print(f"AA2 n={n} fit(inc compile) {w_fit:6.1f}s  "
              f"cg {gp.cg_iterations} it res {gp.cg_residual:.1e}  "
              f"df_resids {['%.1e' % r for r in gp.df_residuals]}",
              flush=True)
        w_mu, mu = timed(lambda: gp.mean(xt))
        print(f"AA2 df mean GEMV ({t} pts, inc compile) {w_mu:6.1f}s  "
              f"mu range [{float(jnp.min(mu)):.3f}, "
              f"{float(jnp.max(mu)):.3f}]", flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    print("=== AA0 final ladder at shipped defaults ===", flush=True)
    c1_double_accuracy()
    print("=== AA1 lazy double vs f64 reference (n=16k) ===", flush=True)
    aa1_lazy_double_16k()
    print("=== AA2 lazy double at n=65k ===", flush=True)
    aa2_lazy_double_65k()
    print("BATCHAA_DONE", flush=True)
