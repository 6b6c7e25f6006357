"""Bench-pipeline variant shootout on the real TPU.

Variants of the n=16k exact-GP fit+predict pipeline (bench.py):
  A. current: alpha = cho_solve_blocked (fwd+bwd), mu = K* @ alpha,
     V = tri_solve_blocked(L, K*.T, nb=2048)
  B. fused-z: z = L^-1 y (forward only, leaf inverses CSE with the wide
     trisolve), mu = V.T @ z — drops the backward substitution
  C. B with nb=4096 wide trisolve
  D. B with nb=1024
Plus an n=32k fit + 16k-point predict (single chip, memory permitting).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_bench_opt.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import safe_cholesky, cho_solve_blocked, tri_solve_blocked

N = 16384
NTEST = 16384
D = 8
REPS = 5


def timed(fn, *args):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(x)[:, :1]) + 0.1 * rng.standard_normal((N, 1)),
        jnp.float32,
    )
    xt = jnp.asarray(rng.uniform(-1, 1, (NTEST, D)), jnp.float32)

    kernel = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    pd = kernel.params_dict
    s = 0.1

    def make_current(nb):
        @jax.jit
        def f(x, y, xt):
            K = kernel.eval_params(pd, x, x)
            K = K + (s * s) * jnp.eye(N, dtype=K.dtype)
            L = safe_cholesky(K).L
            alpha = cho_solve_blocked(L, y, nb=nb)
            K_star = kernel.eval_params(pd, xt, x)
            mu = K_star @ alpha
            V = tri_solve_blocked(L, K_star.T, nb=nb)
            var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
            return jnp.sum(mu) + jnp.sum(var)
        return f

    def make_fused(nb):
        from stpy_tpu.linalg import _tri_rec
        HIP = jax.lax.Precision.HIGHEST

        @jax.jit
        def f(x, y, xt):
            K = kernel.eval_params(pd, x, x)
            K = K + (s * s) * jnp.eye(N, dtype=K.dtype)
            L = safe_cholesky(K).L
            z = _tri_rec(L, y, nb, HIP)              # forward only, 1 RHS
            K_star = kernel.eval_params(pd, xt, x)
            V = tri_solve_blocked(L, K_star.T, nb=nb)
            mu = jax.lax.dot(V.T, z, precision=HIP)
            var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
            return jnp.sum(mu) + jnp.sum(var)
        return f

    for name, f in [
        ("A current nb=2048", make_current(2048)),
        ("B fused-z nb=2048", make_fused(2048)),
        ("C fused-z nb=4096", make_fused(4096)),
        ("D fused-z nb=1024", make_fused(1024)),
    ]:
        t = timed(f, x, y, xt)
        print(f"{name}: {t*1000:.1f} ms", flush=True)

    # accuracy sanity: fused-z mu must match current mu (f32 on-device diff)
    def mu_current(x, y, xt, nb=2048):
        K = kernel.eval_params(pd, x, x) + (s * s) * jnp.eye(N, dtype=jnp.float32)
        L = safe_cholesky(K).L
        alpha = cho_solve_blocked(L, y, nb=nb)
        K_star = kernel.eval_params(pd, xt, x)
        return K_star @ alpha

    def mu_fused(x, y, xt, nb=2048):
        from stpy_tpu.linalg import _tri_rec
        HIP = jax.lax.Precision.HIGHEST
        K = kernel.eval_params(pd, x, x) + (s * s) * jnp.eye(N, jnp.float32)
        L = safe_cholesky(K).L
        z = _tri_rec(L, y, nb, HIP)
        K_star = kernel.eval_params(pd, xt, x)
        V = tri_solve_blocked(L, K_star.T, nb=nb)
        return jax.lax.dot(V.T, z, precision=HIP)

    ma = jax.jit(mu_current)(x, y, xt)
    mb = jax.jit(mu_fused)(x, y, xt)
    d = float(jnp.max(jnp.abs(ma - mb)) / (jnp.max(jnp.abs(ma)) + 1e-30))
    print(f"fused-z vs current mu: max rel diff {d:.2e}", flush=True)

    # --- n=32k single-chip fit + 16k predict (VERDICT item 7 artifact) ---
    N2, T2 = 32768, 16384
    x2 = jnp.asarray(rng.uniform(-1, 1, (N2, D)), jnp.float32)
    y2 = jnp.asarray(
        np.sin(3 * np.asarray(x2)[:, :1]) + 0.1 * rng.standard_normal((N2, 1)),
        jnp.float32,
    )
    xt2 = jnp.asarray(rng.uniform(-1, 1, (T2, D)), jnp.float32)

    from stpy_tpu.linalg import _tri_rec
    HIP = jax.lax.Precision.HIGHEST

    @jax.jit
    def f32k(x, y, xt):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N2, dtype=K.dtype)
        L = safe_cholesky(K).L
        z = _tri_rec(L, y, 2048, HIP)
        K_star = kernel.eval_params(pd, xt, x)
        V = tri_solve_blocked(L, K_star.T, nb=2048)
        mu = jax.lax.dot(V.T, z, precision=HIP)
        var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
        return jnp.sum(mu) + jnp.sum(var)

    try:
        t = timed(f32k, x2, y2, xt2)
        print(f"n=32768 fit + 16k predict: {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 failed: {type(e).__name__}: {e}", flush=True)

    # fit-only (Gram + Cholesky + z) at 32k
    @jax.jit
    def fit32k(x, y):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N2, dtype=K.dtype)
        L = safe_cholesky(K).L
        z = _tri_rec(L, y, 2048, HIP)
        return jnp.sum(z) + L[0, 0]

    try:
        t = timed(fit32k, x2, y2)
        print(f"n=32768 fit only: {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 fit-only failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
