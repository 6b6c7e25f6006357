"""Follow-up to exp_bench_opt: block-size confirm + n=32k single-chip runs.

exp_bench_opt measured (n=16k pipeline): nb=2048 current 218 ms, fused-z
219 ms (alpha solve already CSE-free), nb=4096 256 ms, nb=1024 fused 206 ms.
Here: current-structure pipeline at nb ∈ {1024, 512}, plus n=32k fit(+16k
predict) for the scale ledger.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_bench_opt2.py
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
    float(fn(*args))
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

    def make_pipeline(n, nb):
        @jax.jit
        def f(x, y, xt):
            K = kernel.eval_params(pd, x, x)
            K = K + (s * s) * jnp.eye(n, dtype=K.dtype)
            L = safe_cholesky(K).L
            alpha = cho_solve_blocked(L, y, nb=nb)
            K_star = kernel.eval_params(pd, xt, x)
            mu = K_star @ alpha
            V = tri_solve_blocked(L, K_star.T, nb=nb)
            var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
            return jnp.sum(mu) + jnp.sum(var)
        return f

    for name, f in [
        ("pipeline nb=1024", make_pipeline(N, 1024)),
        ("pipeline nb=512", make_pipeline(N, 512)),
    ]:
        t = timed(f, x, y, xt)
        print(f"{name}: {t*1000:.1f} ms", flush=True)

    # --- n=32k single-chip (scale ledger) ---
    N2, T2 = 32768, 16384
    x2 = jnp.asarray(rng.uniform(-1, 1, (N2, D)), jnp.float32)
    y2 = jnp.asarray(
        np.sin(3 * np.asarray(x2)[:, :1]) + 0.1 * rng.standard_normal((N2, 1)),
        jnp.float32,
    )
    xt2 = jnp.asarray(rng.uniform(-1, 1, (T2, D)), jnp.float32)

    @jax.jit
    def f32k(x, y, xt):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N2, dtype=K.dtype)
        L = safe_cholesky(K).L
        alpha = cho_solve_blocked(L, y, nb=1024)
        K_star = kernel.eval_params(pd, xt, x)
        mu = K_star @ alpha
        V = tri_solve_blocked(L, K_star.T, nb=1024)
        var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
        return jnp.sum(mu) + jnp.sum(var)

    try:
        t = timed(f32k, x2, y2, xt2)
        print(f"n=32768 fit + 16k predict: {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 pipeline failed: {type(e).__name__}: {e}", flush=True)

    @jax.jit
    def fit32k(x, y):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N2, dtype=K.dtype)
        L = safe_cholesky(K).L
        alpha = cho_solve_blocked(L, y, nb=1024)
        return jnp.sum(alpha) + L[0, 0]

    try:
        t = timed(fit32k, x2, y2)
        print(f"n=32768 fit only: {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 fit-only failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
