"""n=32k dense exact-GP on ONE v5e chip (16 GB HBM) — scale ledger entry.

The safe_cholesky jitter ladder keeps the pre-jitter Gram alive across the
while_loop (retry semantics) which, with the layout copies around the XLA
Cholesky custom-call, pushes a 32k pipeline to ~16 GB and OOMs
(exp_bench_opt2.py). With the fixed-jitter `chol_jittered` the Gram can be
freed after the diagonal add: peak ≈ Gram + chol-input + L = 12 GB.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_32k.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import chol_jittered, cho_solve_blocked, tri_solve_blocked

N, T, D = 32768, 16384, 8
REPS = 3


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
    xt = jnp.asarray(rng.uniform(-1, 1, (T, D)), jnp.float32)

    kernel = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    pd = kernel.params_dict
    s = 0.1

    @jax.jit
    def fit32k(x, y):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N, dtype=K.dtype)
        L = chol_jittered(K)
        alpha = cho_solve_blocked(L, y)
        return jnp.sum(alpha) + L[0, 0]

    try:
        t = timed(fit32k, x, y)
        print(f"n=32768 fit (Gram+chol+alpha): {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 fit failed: {type(e).__name__}: {str(e)[:500]}",
              flush=True)

    @jax.jit
    def pipe32k(x, y, xt):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(N, dtype=K.dtype)
        L = chol_jittered(K)
        alpha = cho_solve_blocked(L, y)
        K_star = kernel.eval_params(pd, xt, x)
        mu = K_star @ alpha
        V = tri_solve_blocked(L, K_star.T)
        var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30)
        return jnp.sum(mu) + jnp.sum(var)

    try:
        t = timed(pipe32k, x, y, xt)
        print(f"n=32768 fit + 16k predict: {t*1000:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"n=32768 pipeline failed: {type(e).__name__}: {str(e)[:500]}",
              flush=True)


if __name__ == "__main__":
    main()
