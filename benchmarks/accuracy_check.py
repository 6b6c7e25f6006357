"""Accuracy check: full f32 TPU exact-GP pipeline vs a float64 host
reference, same f32-rounded inputs.

Measures what the precision policy (docs/DESIGN.md §2/§5) actually delivers:
posterior alpha / mean / variance errors at a given n. Run on a TPU host:

    python benchmarks/accuracy_check.py [n]

Representative v5e results (2026-08): see docs/DESIGN.md §5.
"""

import sys

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import tri_solve_blocked


def main(n=4096, d=8, gamma=0.5, s2=0.01):
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1]).ravel()

    # f64 reference (GEMM-based distances: no (n, n, d) intermediate)
    nx = (xh * xh).sum(1)
    sq = nx[:, None] + nx[None, :] - 2.0 * (xh @ xh.T)
    np.maximum(sq, 0.0, out=sq)
    K64 = np.exp(-sq / (2 * gamma * gamma))
    del sq
    A64 = K64 + s2 * np.eye(n)
    L64 = np.linalg.cholesky(A64)
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    mu64 = K64 @ a64
    V64 = solve_triangular(L64, K64, lower=True)
    var64 = K64.diagonal() - (V64**2).sum(0)
    del V64, A64, L64

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    k = KernelFunction(kernel_name="squared_exponential", gamma=gamma, d=d)
    pd = k.params_dict

    @jax.jit
    def pipe(x, y):
        K = k.eval_params(pd, x, x)
        A = K + s2 * jnp.eye(n, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        z = jax.scipy.linalg.solve_triangular(L, y[:, None], lower=True)
        a = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)[:, 0]
        mu = K @ a
        V = tri_solve_blocked(L, K)
        var = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
        return a, mu, var

    a, mu, var = [np.asarray(v, np.float64) for v in pipe(x, y)]
    rel = lambda e, r: np.max(np.abs(e - r)) / np.max(np.abs(r))
    vrel = np.abs(var - var64) / np.maximum(var64, 1e-12)
    print(f"n={n} d={d} gamma={gamma} s2={s2}")
    print(f"alpha rel err: {rel(a, a64):.2e}")
    print(f"mean  rel err: {rel(mu, mu64):.2e}")
    print(f"var   abs err: {np.max(np.abs(var - var64)):.2e}  "
          f"rel max {np.max(vrel):.2e}  rel median {np.median(vrel):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
