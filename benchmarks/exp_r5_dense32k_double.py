"""Round-5 TPU batch — dense-double at n=32,768 on ONE chip via
fold_noise=True (ROADMAP "Accuracy" item 1).

The standard dense-double fit peaks at 4n² f32 buffers (Kh, Kl, A, L ≈
17 GB at 32k — measured OOM, r5 lazy_double_var v1), ceiling n≈24.5k.
fold_noise=True folds s²+jitter into the df Gram diagonal with exact
TwoSum ops and factorizes the folded pair directly — A never exists,
peak 3n² ≈ 12.9 GB, and the jitter is exactly unfolded afterwards so
refinement/qform target K + s²I bit-for-bit like the standard path
(tests/test_exact_gp.py::test_fold_noise_matches_standard_double).

Stages (one per process — OOM isolation):
  se    single-atom se (default)
  comp  2-atom se+matern composite — needs the strip_fold in-place df
        algebra fold (df_gram_from_desc): the full-atom fold holds
        out-pair + atom-pair = 4n² (17 GB) before the solver ever runs;
        strip-wise folding is 2n² + strip, so the whole composite fit
        peaks at ~13 GB.

Accuracy vs host numpy f64 of the same f32-rounded inputs at t=2048
(gauss_procc.py:152,391-399 — the reference is f64 but cannot hold
n=32k dense on this host's torch either way).

Run on the TPU host:
  timeout 9000 python benchmarks/exp_r5_dense32k_double.py [se|comp]
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

    stage = sys.argv[1] if len(sys.argv) > 1 else "se"
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (T, D)).astype(np.float32).astype(np.float64)

    def se64(a, b, g=0.5):
        return np.exp(-((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
                      / (2 * g * g))

    def mat64(a, b, g=1.0):
        d = np.sqrt(np.maximum(
            ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1), 0.0)) / g
        k = np.sqrt(3.0) * d
        return (1.0 + k) * np.exp(-k)

    if stage == "se":
        k64 = se64
        kdiag = 1.0
        mk = lambda: KernelFunction(kernel_name="squared_exponential",
                                    gamma=0.5, d=D)
    else:
        k64 = lambda a, b: se64(a, b) + mat64(a, b)
        kdiag = 2.0
        mk = lambda: (KernelFunction(kernel_name="squared_exponential",
                                     gamma=0.5, d=D)
                      + KernelFunction(kernel_name="matern", gamma=1.0,
                                       nu=1.5, d=D))

    # host f64 reference posterior (cached: ~20 GB RAM transient, minutes;
    # row-chunked K build keeps the broadcast transient bounded)
    cache = f"/tmp/dense32k_{stage}_ref.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        mu64, var64 = z["mu"], z["var"]
    else:
        K = np.empty((N, N))
        for r0 in range(0, N, 4096):
            K[r0:r0 + 4096] = k64(xh[r0:r0 + 4096], xh)
        K[np.arange(N), np.arange(N)] += S * S
        L = np.linalg.cholesky(K)
        del K
        al = solve_triangular(
            L.T, solve_triangular(L, yh, lower=True), lower=False)
        Ks = k64(xt, xh)
        mu64 = (Ks @ al).ravel()
        V = solve_triangular(L, Ks.T, lower=True)
        var64 = np.maximum(kdiag - (V ** 2).sum(0), 1e-30)
        del L, V, Ks
        np.savez(cache, mu=mu64, var=var64)
    print("host reference ready", flush=True)

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xtj = jnp.asarray(xt, jnp.float32)
    gp = GaussianProcess(
        kernel=mk(), s=S, precision="double", var_refine=1,
        jitter_ladder=False, fold_noise=True,
    )
    # SEPARATE fit_gp + mean_std calls (two dispatches): the fused
    # fit_predict program's live set (fit buffers + predict temps + the
    # L/Th/Tl output allocations in ONE program) runtime-OOMs at 32k;
    # the split path serves predict from the STORED factors — capability
    # row, not the serving shape (that's n=16k).
    t0 = time.perf_counter()
    gp.fit_gp(x, y)
    float(jnp.sum(gp.A))
    cold_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, sd = gp.mean_std(xtj)
    float(jnp.sum(sd))
    cold_ms = time.perf_counter() - t0
    walls_f, walls_m = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        gp.fit_gp(x, y)
        float(jnp.sum(gp.A))
        walls_f.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        mu, sd = gp.mean_std(xtj)
        float(jnp.sum(sd))
        walls_m.append(time.perf_counter() - t0)
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    print(f"dense-double fold_noise [{stage}] n={N} t={T}: warm fit "
          f"{np.median(walls_f):.3f}s + mean_std {np.median(walls_m):.3f}s "
          f"(cold {cold_fit:.1f}/{cold_ms:.1f}s) | vs host f64: mean rel "
          f"{mrel:.2e}, var max {vrel.max():.2e} med {np.median(vrel):.2e} "
          f"| fit_status {gp.fit_status}", flush=True)
    print("R5_DENSE32K_DOUBLE_DONE", flush=True)


if __name__ == "__main__":
    main()
