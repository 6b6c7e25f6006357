"""Round-3 TPU batch Z — the recompute-over-residency jitter ladder.

Z1: XLA memory_analysis of the compiled single-precision fit at n=16k
    for jitter_ladder True / "recompute" / False (compile-only, fast).
Z2: the claim itself — n=32,768 laddered fit on ONE 16 GB v5e. The
    carried-Gram ladder OOMs here (benchmarks/exp_32k.py, r2);
    "recompute" must complete, and its wall is recorded next to the
    fixed-jitter 613 ms.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_z.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def z1_memory(n=16384, d=8, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, :1])))
    n2 = n * n * 4 / 2**20
    for mode in (True, "recompute", False):
        try:
            gp = GaussianProcess(
                kernel=KernelFunction(kernel_name="squared_exponential",
                                      gamma=0.5, d=d),
                s=s, jitter_ladder=mode)
            gp._build_jits()
            ma = gp._fit_fn.lower(
                x, y, gp.kernel_object.params_dict, jnp.float32(s)
            ).compile().memory_analysis()
            t = ma.temp_size_in_bytes / 2**20
            print(f"Z1 n={n} mode={str(mode):10s} temp {t:8.1f} MB "
                  f"= {t/n2:.2f} n^2", flush=True)
        except Exception:
            traceback.print_exc()


def z2_32k(mode, n=32768, d=8, s=0.1, t=16384):
    """One mode per process: a prior mode's live buffers (or a prior OOM)
    must not contaminate the next measurement."""
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, :1])))
    xt = jnp.asarray(rng.uniform(-1, 1, (t, d)), jnp.float32)
    try:
        gp = GaussianProcess(
            kernel=KernelFunction(kernel_name="squared_exponential",
                                  gamma=0.5, d=d),
            s=s, jitter_ladder=mode)
        t0 = time.perf_counter()
        gp.fit_gp(x, y)
        ok = gp.fit_status["cholesky_ok"]
        print(f"Z2 n={n} mode={str(mode):10s} fit(inc compile) "
              f"{time.perf_counter()-t0:6.1f}s ok={ok}", flush=True)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            gp.fit_gp(x, y)
            float(jnp.sum(gp.A))          # force through the tunnel
            walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        mu, sd = gp.mean_std(xt)
        float(jnp.sum(mu) + jnp.sum(sd))
        pw = time.perf_counter() - t0
        print(f"Z2 n={n} mode={str(mode):10s} warm fit "
              f"{np.median(walls):6.3f}s  predict(16k, inc compile) "
              f"{pw:6.1f}s", flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        z2_32k(sys.argv[1] if sys.argv[1] != "False" else False)
    else:
        z1_memory()
    print("BATCHZ_DONE", flush=True)
