"""Accuracy check: full TPU exact-GP pipeline vs a float64 host reference,
same f32-rounded inputs, through the public GaussianProcess API.

Measures what the precision policy (docs/DESIGN.md §2/§5) actually delivers:
posterior mean / std errors at a given n, for both precision modes:

  single : f32 Pallas Gram, Cholesky, blocked trisolve (HIGH default)
  double : double-float (hi, lo) Pallas Gram + iterative refinement +
           df predictive mean (ops/pallas_gram_df.py), HIGHEST trisolve

Run on a TPU host:   python benchmarks/accuracy_check.py [n]
Representative v5e results: see docs/DESIGN.md §5.
"""

import sys
import time

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess


def main(n=16384, d=8, gamma=0.5, s=0.1, ntest=None):
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = (rng.uniform(-1, 1, (n if ntest is None else ntest, d))
          .astype(np.float32).astype(np.float64))

    # f64 reference posterior (GEMM-based distances, no (n,n,d) temp)
    def k64(a, b):
        na = (a * a).sum(1)
        nb = (b * b).sum(1)
        sq = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
        np.maximum(sq, 0.0, out=sq)
        return np.exp(-sq / (2 * gamma * gamma))

    print(f"building f64 reference n={n} ...", flush=True)
    K = k64(xh, xh)
    L64 = np.linalg.cholesky(K + s * s * np.eye(n))
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    Ks = k64(xt, xh)
    mu64 = (Ks @ a64).ravel()
    V64 = solve_triangular(L64, Ks.T, lower=True)
    std64 = np.sqrt(np.maximum(1.0 - (V64**2).sum(0), 1e-30))
    var64 = std64**2
    del K, L64, V64, Ks

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xtj = jnp.asarray(xt, jnp.float32)

    for mode, var_refine in (("single", 0), ("double", 0), ("double", 1)):
        k = KernelFunction(
            kernel_name="squared_exponential", gamma=gamma, d=d
        )
        gp = GaussianProcess(
            kernel=k, s=s, d=d, precision=mode, var_refine=var_refine
        )
        t0 = time.perf_counter()
        gp.fit_gp(x, y)
        mu, sd = gp.mean_std(xtj)
        mu = np.asarray(mu, np.float64).ravel()
        sd = np.asarray(sd, np.float64).ravel()
        wall = time.perf_counter() - t0
        mean_rel = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
        vrel = np.abs(sd**2 - var64) / np.maximum(var64, 1e-12)
        tag = mode if not var_refine else f"{mode}+vr{var_refine}"
        print(
            f"{tag:10s} [{wall:5.1f}s inc compile] "
            f"mean rel err {mean_rel:.2e}   "
            f"var rel err max {np.max(vrel):.2e} med {np.median(vrel):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
