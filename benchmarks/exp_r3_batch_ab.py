"""Round-3 TPU batch AB — warm walls for the lazy double tier.

Batch AA measured IterativeGP(precision="double") compile-INCLUSIVE
(fit 22.6 s at n=16k). This batch separates compile from the serving
cost: warm fit (PCG + df refinement) and warm df mean GEMV at n=16k and
n=32k, single vs double, so RESULTS.md can state what a refit actually
costs once the programs are cached.

Run on the TPU host: timeout 7000 python benchmarks/exp_r3_batch_ab.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    if out is not None:
        jnp.sum(jnp.asarray(out)).item()
    return time.perf_counter() - t0, out


def ab1(n, d=8, s=0.2, t=2048):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1]) + 0.1 * jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (t, d)), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=d))
    for prec, steps in (("single", 0), ("double", 1)):
        try:
            gp = IterativeGP(k, s=s, lazy=True, tol=1e-6, maxiter=300,
                             precond_rank=512, precision=prec,
                             df_refine_steps=steps)
            w_cold, _ = timed(lambda: gp.fit_gp(x, y))
            walls = []
            for _ in range(2):
                w, _ = timed(lambda: gp.fit_gp(x, y))
                walls.append(w)
            w_mu_cold, _ = timed(lambda: gp.mean(xt))
            w_mu, _ = timed(lambda: gp.mean(xt))
            res = getattr(gp, "df_residuals", None) or []
            print(f"AB1 n={n} {prec:6s} fit cold {w_cold:6.1f}s warm "
                  f"{min(walls):6.2f}s (cg {gp.cg_iterations} it "
                  f"res {gp.cg_residual:.1e})  mean({t}) cold "
                  f"{w_mu_cold:5.1f}s warm {w_mu:5.2f}s  df_resids "
                  f"{['%.1e' % r for r in res]}", flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    ab1(16384)
    ab1(32768)
    print("BATCHAB_DONE", flush=True)
