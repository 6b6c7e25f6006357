"""Round-2 experiment: iterative refinement + fast-factor variants at n=16k.

Measures on one v5e chip:
  A. accuracy of plain f32 pipeline (reproduce r1 numbers)
  B. mean accuracy after 1-2 refinement steps with (v1) plain HIGHEST GEMV
     residual, (v2) chunk-compensated residual
  C. same refinement but with a cheap factor (chol_recursive HIGH schur)
  D. component timings: XLA chol / chol_recursive variants / refinement step

Run: python benchmarks/exp_refine.py [n]
"""

import sys
import time

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import (chol_recursive, tri_solve_blocked,
                             cho_solve_blocked)
from stpy_tpu.utils.metrics import time_jitted


def f64_reference(xh, yh, s2, gamma):
    nx = (xh * xh).sum(1)
    sq = nx[:, None] + nx[None, :] - 2.0 * (xh @ xh.T)
    np.maximum(sq, 0.0, out=sq)
    K64 = np.exp(-sq / (2 * gamma * gamma))
    del sq
    n = xh.shape[0]
    A64 = K64 + s2 * np.eye(n)
    L64 = np.linalg.cholesky(A64)
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    mu64 = K64 @ a64
    V64 = solve_triangular(L64, K64, lower=True)
    var64 = K64.diagonal() - (V64**2).sum(0)
    return K64, a64, mu64, var64


def main(n=16384, d=8, gamma=0.5, s2=0.01):
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1]).ravel()

    print(f"building f64 reference n={n} ...", flush=True)
    K64, a64, mu64, var64 = f64_reference(xh, yh, s2, gamma)

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    k = KernelFunction(kernel_name="squared_exponential", gamma=gamma, d=d)
    pd = k.params_dict
    HI = jax.lax.Precision.HIGHEST

    def gram(x):
        return k.eval_params(pd, x, x)

    def resid_plain(K, a):
        # r = y - (K + s2 I) a, single HIGHEST GEMV
        return y - (jax.lax.dot(K, a[:, None], precision=HI)[:, 0] + s2 * a)

    def resid_comp(K, a, nc=128):
        # chunk the contraction: partials have <= n/nc-term f32 accumulation,
        # then compensated (Neumaier) summation over the nc partials.
        m = n // nc
        P = jax.lax.dot_general(
            K.reshape(n, nc, m), a.reshape(nc, m),
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            precision=HI,
        )  # (nc, n)
        def body(carry, p):
            s, c = carry
            t = s + p
            e = jnp.where(jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s)
            return (t, c + e), None
        (ssum, corr), _ = jax.lax.scan(
            body, (jnp.zeros(n, K.dtype), jnp.zeros(n, K.dtype)), P
        )
        Ka = ssum + corr
        return y - (Ka + s2 * a)

    def pipe(x, y, chol_fn, n_refine, resid_fn):
        K = gram(x)
        A = K + s2 * jnp.eye(n, dtype=jnp.float32)
        L = chol_fn(A)
        a = cho_solve_blocked(L, y[:, None])[:, 0]
        for _ in range(n_refine):
            r = resid_fn(K, a)
            a = a + cho_solve_blocked(L, r[:, None])[:, 0]
        mu = jax.lax.dot(K, a[:, None], precision=HI)[:, 0]
        V = tri_solve_blocked(L, K, precision=HI)
        var = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
        return a, mu, var

    chols = {
        "xla": jnp.linalg.cholesky,
        "rec_hi": lambda A: chol_recursive(A, nb=2048, precision=HI),
        "rec_high": lambda A: chol_recursive(
            A, nb=2048, precision=HI,
        ),
    }
    # rec with HIGH schur updates
    from functools import partial
    from stpy_tpu.linalg import _chol_rec

    def rec_sloppy(A, nb=2048):
        import stpy_tpu.linalg as L
        return L._chol_rec(A, nb, jax.lax.Precision.HIGH)

    def report(tag, a, mu, var):
        a = np.asarray(a, np.float64)
        mu = np.asarray(mu, np.float64)
        var = np.asarray(var, np.float64)
        rel = lambda e, r: np.max(np.abs(e - r)) / np.max(np.abs(r))
        vrel = np.abs(var - var64) / np.maximum(var64, 1e-12)
        print(f"{tag:34s} alpha {rel(a, a64):.2e}  mean {rel(mu, mu64):.2e}"
              f"  var max {np.max(vrel):.2e} med {np.median(vrel):.2e}",
              flush=True)

    configs = [
        ("xla chol, no refine", jnp.linalg.cholesky, 0, resid_plain),
        ("xla chol, 1x plain refine", jnp.linalg.cholesky, 1, resid_plain),
        ("xla chol, 1x comp refine", jnp.linalg.cholesky, 1, resid_comp),
        ("xla chol, 2x comp refine", jnp.linalg.cholesky, 2, resid_comp),
        ("sloppy rec chol, 2x comp refine", rec_sloppy, 2, resid_comp),
    ]
    for tag, cf, nr, rf in configs:
        f = jax.jit(lambda x, y, cf=cf, nr=nr, rf=rf: pipe(x, y, cf, nr, rf))
        ct, rt = time_jitted(f, x, y, reps=3)
        out = f(x, y)
        report(f"{tag} [{rt*1e3:.0f}ms]", *out)

    # component timings
    K = gram(x)
    A = K + s2 * jnp.eye(n, dtype=jnp.float32)
    A = jax.block_until_ready(A)
    for tag, fn in [
        ("gram", jax.jit(lambda x: jnp.sum(gram(x)))),
        ("xla chol", jax.jit(lambda A: jnp.sum(jnp.linalg.cholesky(A)))),
        ("rec chol HIGHEST", jax.jit(
            lambda A: jnp.sum(chol_recursive(A, nb=2048, precision=HI)))),
        ("rec chol HIGH", jax.jit(lambda A: jnp.sum(rec_sloppy(A)))),
        ("rec chol HIGH nb=4096", jax.jit(
            lambda A: jnp.sum(rec_sloppy(A, nb=4096)))),
    ]:
        arg = x if tag == "gram" else A
        ct, rt = time_jitted(fn, arg, reps=5)
        flops = n**3 / 3 if "chol" in tag else 2 * n * n * d
        print(f"{tag:24s} {rt*1e3:7.1f} ms   {flops/rt/1e12:6.1f} TFLOP/s"
              f"  (compile {ct:.1f}s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
