"""Benchmark: n=16k exact-GP fit + predict wall-time on one chip.

The north-star metric from BASELINE.md: exact GP fit + posterior at n=16k in
< 1 s on one v5e chip (Gram via the fused Pallas MXU kernel + Cholesky +
solves, full 16k-point predictive mean/std), vs. the torch-CPU reference
which chunks prediction at 10k rows and loops the predictive diagonal.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: the whole fit+predict is one jitted computation; we
block on a device scalar to defeat async dispatch, and report the median of
repeated runs (compile excluded).
"""

import json
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

    @jax.jit
    def fit_predict(x, y, xt):
        K = kernel.eval_params(pd, x, x)
        # Cholesky reads only the lower triangle; fused Gram is symmetric
        K = K + (s * s) * jnp.eye(N, dtype=K.dtype)
        L = safe_cholesky(K).L
        # blocked solve shares its diagonal-block inverses (CSE) with the
        # variance solve below
        alpha = cho_solve_blocked(L, y)
        K_star = kernel.eval_params(pd, xt, x)
        mu = K_star @ alpha
        V = tri_solve_blocked(L, K_star.T)
        var = jnp.maximum(
            kernel.diag(xt, pd) - jnp.sum(V * V, axis=0), 1e-30
        )
        # fold to scalars so the host blocks on the full computation
        return jnp.sum(mu) + jnp.sum(var)

    # warm-up / compile
    float(fit_predict(x, y, xt))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fit_predict(x, y, xt))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    # the ACCURACY-QUALIFIED serving config measured alongside the raw
    # headline, so the driver metric cannot silently drift toward
    # accuracy-free speed: precision="double" + var_refine=1 fit_predict
    # is the ≤1e-7 posterior-mean / 1e-6-class variance tier
    # (benchmarks/RESULTS.md, batch Q/Y)
    from stpy_tpu.models import GaussianProcess

    gp = GaussianProcess(
        kernel=kernel, s=s, precision="double", var_refine=1,
    )
    gp.fit_predict(x, y, xt)  # compile + warm-up
    dtimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        mu_d, sd_d = gp.fit_predict(x, y, xt)
        float(jnp.sum(mu_d) + jnp.sum(sd_d))
        dtimes.append(time.perf_counter() - t0)
    wall_double = float(np.median(dtimes))

    # baseline: the reference publishes no numbers (BASELINE.md), so it was
    # MEASURED on this host (benchmarks/exp_reference_wall.py): the actual
    # /root/reference stpy GaussianProcess (torch f64, its faster no-grad
    # LU path) on this exact workload = 605.1 s fit + 494.2 s mean_std =
    # 1099.28 s total. Caveat: this host exposes ONE CPU core to torch; on
    # a typical 32-core server the reference's LAPACK stages would scale
    # ~30-60x (its per-point Python diagonal loop would not) — the
    # extrapolated multicore ratio is emitted alongside so the headline
    # number carries its own caveat.
    REF_WALL_S = 1099.28
    REF_MULTICORE_SCALE = 45.0  # midpoint of the 30-60x LAPACK estimate
    print(
        json.dumps(
            {
                "metric": "exact_gp_fit_predict_n16k_wall_time",
                "value": round(wall, 4),
                "unit": "s",
                "vs_baseline": round(REF_WALL_S / wall, 1),
                "serving_double_vr1_wall_s": round(wall_double, 4),
                "baseline_note": (
                    "reference wall 1099.28 s measured on THIS host with "
                    "torch pinned to one CPU core; ~30-60x faster on a "
                    "typical 32-core server"
                ),
                "vs_baseline_multicore_est": round(
                    REF_WALL_S / REF_MULTICORE_SCALE / wall, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
