"""Round-5 TPU batch — dense-double at n=32,768 on ONE chip via
fold_noise=True (ROADMAP "Accuracy" item 1).

The standard dense-double fit peaks at 4n² f32 buffers (Kh, Kl, A, L ≈
17 GB at 32k — measured OOM, r5 lazy_double_var v1), ceiling n≈24.5k.
fold_noise=True folds s²+jitter into the df Gram diagonal with exact
TwoSum ops and factorizes the folded pair directly — A never exists,
peak 3n² ≈ 12.9 GB, and the jitter is exactly unfolded afterwards so
refinement/qform target K + s²I bit-for-bit like the standard path
(tests/test_exact_gp.py::test_fold_noise_matches_standard_double).

Single-atom se only: a 2-atom composite's df Gram FOLD itself holds
4 n² (out pair + atom pair) before the solver ever runs — the composite
32k ceiling is the algebra fold, not the fit (stated honestly).

Accuracy vs host numpy f64 of the same f32-rounded inputs at t=2048
(gauss_procc.py:152,391-399 — the reference is f64 but cannot hold
n=32k dense on this host's torch either way).

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_dense32k_double.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

N, D, T, S = 32768, 8, 2048, 0.1


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (T, D)).astype(np.float32).astype(np.float64)

    # host f64 reference posterior (cached: ~20 GB RAM transient, minutes)
    cache = "/tmp/dense32k_se_ref.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        mu64, var64 = z["mu"], z["var"]
    else:
        g = 0.5
        K = np.exp(-((xh[:, None, :] - xh[None, :, :]) ** 2).sum(-1)
                   / (2 * g * g))
        K[np.arange(N), np.arange(N)] += S * S
        L = np.linalg.cholesky(K)
        del K
        al = solve_triangular(
            L.T, solve_triangular(L, yh, lower=True), lower=False)
        Ks = np.exp(-((xt[:, None, :] - xh[None, :, :]) ** 2).sum(-1)
                    / (2 * g * g))
        mu64 = (Ks @ al).ravel()
        V = solve_triangular(L, Ks.T, lower=True)
        var64 = np.maximum(1.0 - (V ** 2).sum(0), 1e-30)
        del L, V, Ks
        np.savez(cache, mu=mu64, var=var64)
    print("host reference ready", flush=True)

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xtj = jnp.asarray(xt, jnp.float32)
    gp = GaussianProcess(
        kernel=KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                              d=D),
        s=S, precision="double", var_refine=1, jitter_ladder=False,
        fold_noise=True,
    )
    t0 = time.perf_counter()
    mu, sd = gp.fit_predict(x, y, xtj)
    float(jnp.sum(sd))
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        mu, sd = gp.fit_predict(x, y, xtj)
        float(jnp.sum(sd))
        walls.append(time.perf_counter() - t0)
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    print(f"dense-double fold_noise n={N} t={T}: fused warm "
          f"{np.median(walls):.3f}s (min {min(walls):.3f}, cold+compile "
          f"{cold:.1f}s) | vs host f64: mean rel {mrel:.2e}, var max "
          f"{vrel.max():.2e} med {np.median(vrel):.2e} | fit_status "
          f"{gp.fit_status}", flush=True)
    print("R5_DENSE32K_DOUBLE_DONE", flush=True)


if __name__ == "__main__":
    main()
