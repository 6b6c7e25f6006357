"""Round-4 TPU batch — 65k matrix-free tier on CONSTRUCTOR DEFAULTS
(VERDICT r3 task 8 done-bar): the sum-kernel fit must converge with no
precond knobs (auto Rayleigh-Nyström above the size threshold), and the
t=1024 `mean_std` wall is recorded now that exact variance runs 128-RHS
block CG on every tier (r3 ran ONE vmapped CG per test point on the
fused/dense paths — t sequential solves).

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_65k_var.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, S, T = 65536, 8, 0.2, 1024


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, :1]))
                    + 0.05 * rng.standard_normal((N, 1)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (T, D)), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=D))
    # lazy=True is the only non-default (a dense 65k Gram is 17 GB);
    # everything else — precond_rank="auto", tol, maxiter — is stock
    gp = IterativeGP(k, s=S, lazy=True)

    t0 = time.perf_counter()
    gp.fit_gp(x, y)
    fit_wall = time.perf_counter() - t0
    st = getattr(gp, "fit_status", {})
    print(f"n={N} sum-kernel fit (defaults): {fit_wall:.1f}s inc compile, "
          f"status {st}", flush=True)

    t0 = time.perf_counter()
    mu, sd = gp.mean_std(xt)
    float(jnp.sum(sd))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, sd = gp.mean_std(xt)
    float(jnp.sum(sd))
    warm = time.perf_counter() - t0
    ok = bool(np.all(np.isfinite(np.asarray(mu)))
              and np.all(np.isfinite(np.asarray(sd))))
    print(f"mean_std t={T}: cold {cold:.1f}s, warm {warm:.2f}s, "
          f"finite={ok}, sd range [{float(jnp.min(sd)):.3e}, "
          f"{float(jnp.max(sd)):.3e}]", flush=True)
    print("R4_65K_VAR_DONE", flush=True)


if __name__ == "__main__":
    main()
