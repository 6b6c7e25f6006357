"""Round-2 experiment B: calibrate the achievable MXU rates through this
tunnel, the dispatch-overhead floor, and test whether a storage-rounded
(f64->f32) Gram + refinement reaches <=1e-6 posterior mean at n=16k.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_roofline.py
"""

import time

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import cho_solve_blocked, tri_solve_blocked
from stpy_tpu.utils.metrics import time_jitted

N = 16384
HI = jax.lax.Precision.HIGHEST


def main():
    rng = np.random.default_rng(0)

    # --- dispatch overhead floor ---------------------------------------
    tiny = jnp.ones((8, 8), jnp.float32)
    f0 = jax.jit(lambda a: jnp.sum(a))
    ct, rt = time_jitted(f0, tiny, reps=7)
    print(f"dispatch floor            {rt*1e3:7.1f} ms", flush=True)

    # --- pure GEMM rates -------------------------------------------------
    a32 = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    b32 = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)
    flops = 2.0 * N * N * N
    for tag, fn, args in [
        ("gemm bf16 in/f32 acc", jax.jit(
            lambda a, b: jnp.sum(jax.lax.dot(
                a, b, preferred_element_type=jnp.float32))), (a16, b16)),
        ("gemm f32 DEFAULT", jax.jit(
            lambda a, b: jnp.sum(jax.lax.dot(
                a, b, precision=jax.lax.Precision.DEFAULT))), (a32, b32)),
        ("gemm f32 HIGH", jax.jit(
            lambda a, b: jnp.sum(jax.lax.dot(
                a, b, precision=jax.lax.Precision.HIGH))), (a32, b32)),
        ("gemm f32 HIGHEST", jax.jit(
            lambda a, b: jnp.sum(jax.lax.dot(
                a, b, precision=HI))), (a32, b32)),
    ]:
        ct, rt = time_jitted(fn, *args, reps=5)
        print(f"{tag:25s} {rt*1e3:7.1f} ms   {flops/rt/1e12:6.1f} TFLOP/s"
              f" (compile {ct:.0f}s)", flush=True)

    del a32, b32, a16, b16

    # --- storage-rounded Gram + refinement ------------------------------
    n, d, gamma, s2 = N, 8, 0.5, 0.01
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1]).ravel()
    print("building f64 reference ...", flush=True)
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

    # device K = f64 K rounded once to f32 (pure storage rounding, the best
    # any f32 Gram kernel could deliver) and a LO correction K64 - K32
    K32 = jnp.asarray(K64, jnp.float32)
    Klo = jnp.asarray(K64 - np.asarray(K32, np.float64), jnp.float32)
    y = jnp.asarray(yh, jnp.float32)

    def resid_df(K, Klo, a):
        r_hi = y - (jax.lax.dot(K, a[:, None], precision=HI)[:, 0] + s2 * a)
        return r_hi - jax.lax.dot(Klo, a[:, None], precision=HI)[:, 0]

    def pipe(K, Klo, y, n_refine, use_lo):
        A = K + s2 * jnp.eye(n, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        a = cho_solve_blocked(L, y[:, None])[:, 0]
        for _ in range(n_refine):
            if use_lo:
                r = resid_df(K, Klo, a)
            else:
                r = y - (jax.lax.dot(K, a[:, None], precision=HI)[:, 0]
                         + s2 * a)
            a = a + cho_solve_blocked(L, r[:, None])[:, 0]
        mu = jax.lax.dot(K, a[:, None], precision=HI)[:, 0]
        if use_lo:
            mu = mu + jax.lax.dot(Klo, a[:, None], precision=HI)[:, 0]
        V = tri_solve_blocked(L, K, precision=HI)
        var = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
        return a, mu, var

    def report(tag, out, ms):
        a, mu, var = [np.asarray(v, np.float64) for v in out]
        rel = lambda e, r: np.max(np.abs(e - r)) / np.max(np.abs(r))
        vrel = np.abs(var - var64) / np.maximum(var64, 1e-12)
        print(f"{tag:34s} [{ms:4.0f}ms] alpha {rel(a, a64):.2e}  "
              f"mean {rel(mu, mu64):.2e}  var max {np.max(vrel):.2e} "
              f"med {np.median(vrel):.2e}", flush=True)

    for tag, nr, lo in [
        ("storageK, no refine", 0, False),
        ("storageK, 1x refine", 1, False),
        ("storageK, 2x refine", 2, False),
        ("storageK+lo, 1x df refine", 1, True),
        ("storageK+lo, 2x df refine", 2, True),
    ]:
        f = jax.jit(lambda K, Kl, y, nr=nr, lo=lo: pipe(K, Kl, y, nr, lo))
        ct, rt = time_jitted(f, K32, Klo, y, reps=3)
        report(tag, f(K32, Klo, y), rt * 1e3)


if __name__ == "__main__":
    main()
