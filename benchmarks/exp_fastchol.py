"""Can the Pallas syrk Cholesky (fast=True, 55 ms vs XLA's 64) carry the
headline bench WITHOUT giving up single-mode accuracy?

Pipeline variant: fast factor + ONE alpha-refinement step (residual against
the f32 Gram at HIGHEST, correction through the same factor) for the mean;
variance goes through the usual HIGH trisolve on the fast factor. Compares
mean/var against the f64 host reference and times the full pipeline.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_fastchol.py
"""

import time
import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import safe_cholesky, cho_solve_blocked, tri_solve_blocked

N, D = 16384, 8
HI = jax.lax.Precision.HIGHEST


def main(n=N, d=D, gamma=0.5, s=0.1):
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt64 = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)

    print("building f64 reference ...", flush=True)
    def k64(a, b):
        na = (a * a).sum(1)
        nb = (b * b).sum(1)
        sq = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
        np.maximum(sq, 0.0, out=sq)
        return np.exp(-sq / (2 * gamma * gamma))

    K64 = k64(xh, xh)
    L64 = np.linalg.cholesky(K64 + s * s * np.eye(n))
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    Ks64 = k64(xt64, xh)
    mu64 = (Ks64 @ a64).ravel()
    V64 = solve_triangular(L64, Ks64.T, lower=True)
    var64 = 1.0 - (V64**2).sum(0)
    del K64, L64, V64, Ks64

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xt = jnp.asarray(xt64, jnp.float32)

    kernel = KernelFunction(kernel_name="squared_exponential", gamma=gamma, d=d)
    pd = kernel.params_dict

    def make(fast, refine):
        @jax.jit
        def f(x, y, xt):
            K = kernel.eval_params(pd, x, x)
            A = K + (s * s) * jnp.eye(n, dtype=K.dtype)
            L = safe_cholesky(A, fast=fast).L
            alpha = cho_solve_blocked(L, y)
            if refine:
                r = y - (jax.lax.dot(K, alpha, precision=HI)
                         + (s * s) * alpha)
                alpha = alpha + cho_solve_blocked(L, r)
            K_star = kernel.eval_params(pd, xt, x)
            mu = K_star @ alpha
            V = tri_solve_blocked(L, K_star.T)
            var = jnp.maximum(
                kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30
            )
            return mu, var
        return f

    for tag, f in [
        ("xla-chol no-refine", make(False, False)),
        ("fast-chol no-refine", make(True, False)),
        ("fast-chol +1 refine", make(True, True)),
    ]:
        mu, var = f(x, y, xt)            # compile+warm
        float(jnp.sum(mu))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            mu, var = f(x, y, xt)
            float(jnp.sum(mu) + jnp.sum(var))
            ts.append(time.perf_counter() - t0)
        wall = float(np.median(ts))
        mu = np.asarray(mu, np.float64).ravel()
        var = np.asarray(var, np.float64).ravel()
        merr = np.abs(mu - mu64).max() / np.abs(mu64).max()
        vrel = np.abs(var - var64) / np.maximum(var64, 1e-12)
        print(f"{tag:20s} [{wall*1e3:5.0f}ms] mean {merr:.2e} "
              f"var max {vrel.max():.2e} med {np.median(vrel):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
