"""Round-5 TPU batch — generic df tier done-bar, v2 (VERDICT r5 task 2).

The r4 script's first run exposed two flaws in the SCRIPT (not the tier):
  1. its "warm" wall was fit_predict's FIRST call — a separate jit from
     the fit_gp/mean_std warmup, i.e. compile time (the "se (fused)"
     control row "measured" 109 s where the serving benchmarks pin that
     exact tier at ~0.9 s). v2 warms fit_predict itself, then times 3
     reps and reports the median (the exp_r4_qform_fix discipline).
  2. at D=4 the 8k training set is DENSE in [-1,1]^4, so the true
     posterior variance collapses toward the f64 rounding floor of the
     kss − ΣV² cancellation — the HOST reference itself has no correct
     digits and pointwise var rel-err is meaningless. v2 uses D=8 (the
     same geometry as every other accuracy table in RESULTS.md), where
     var64 is healthy (~1e-4..1e-2 here).

Families: gibbs (input-dependent lengthscale), polynomial deg 3
(rank-165 Gram, cond(A) ~ 1e7 — the refinement stress case, measured at
default df_refine_steps=1 AND steps=3), se+linear (fused atom folded
with a generic atom), matern nu=1.2 (general-ν Bessel quadrature —
df-expressible since r5), and the fused-se control row.
Done-bar (r3): every generic family ≤5e-7 posterior-mean rel err at
n=8k, plus the measured double/f32 cost multiple.
Reference: host numpy f64 of the same f32-rounded inputs
(stpy/continuous_processes/gauss_procc.py:152 — f64 for every kernel).

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_generic_acc2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import solve_triangular
from scipy.special import gamma as sgamma, kv as skv

import jax
import jax.numpy as jnp

N, D, S = 8192, 8, 0.1


def host_posterior(k64, xh, yh, xt, s):
    K = k64(xh, xh)
    L = np.linalg.cholesky(K + s * s * np.eye(N))
    al = solve_triangular(L.T, solve_triangular(L, yh, lower=True),
                          lower=False)
    Ks = k64(xt, xh)
    mu = (Ks @ al).ravel()
    V = solve_triangular(L, Ks.T, lower=True)
    kss = np.diag(k64(xt, xt)).copy()
    var = np.maximum(kss - (V ** 2).sum(0), 1e-30)
    return mu, var


def run(name, mk, k64, expect_generic=True, refine_steps=None):
    from stpy_tpu.kernels.df_plan import df_atom_desc
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    mu64, var64 = host_posterior(k64, xh, yh, xt, S)

    kw = {} if refine_steps is None else {"df_refine_steps": refine_steps}
    gp = GaussianProcess(kernel=mk(), s=S, precision="double", var_refine=1,
                         **kw)
    fams = [f for (_, f, _, _, _, _) in df_atom_desc(gp.kernel_object)]
    if expect_generic:
        assert "generic" in fams, (name, fams)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    # warm THE timed entry point (fit_predict is its own jit program)
    t0 = time.perf_counter()
    mu, sd = gp.fit_predict(x, y, xtj)
    float(jnp.sum(sd))
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        mu, sd = gp.fit_predict(x, y, xtj)
        float(jnp.sum(sd))
        walls.append(time.perf_counter() - t0)
    warm = float(np.median(walls))
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    del gp
    # f32 tier on the same workload (same warm discipline)
    gps = GaussianProcess(kernel=mk(), s=S)
    mu1, sd1 = gps.fit_predict(x, y, xtj)
    float(jnp.sum(sd1))
    w32 = []
    for _ in range(3):
        t0 = time.perf_counter()
        mu1, sd1 = gps.fit_predict(x, y, xtj)
        float(jnp.sum(sd1))
        w32.append(time.perf_counter() - t0)
    warm_f32 = float(np.median(w32))
    m32 = (np.abs(np.asarray(mu1, np.float64).ravel() - mu64).max()
           / np.abs(mu64).max())
    rs = "default" if refine_steps is None else f"ir={refine_steps}"
    print(f"{name:12s} [{rs:7s}] plan={fams} mean rel {mrel:.2e}  "
          f"var max {vrel.max():.2e} med {np.median(vrel):.2e}  "
          f"warm {warm:.2f}s (cold+compile {cold:.1f}s) "
          f"| f32: warm {warm_f32:.2f}s mean rel {m32:.2e} "
          f"| double/f32 x{warm / max(warm_f32, 1e-9):.1f}",
          flush=True)
    del gps


def matern_nu64(a, b, gamma, nu):
    d = np.sqrt(np.maximum(
        ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1), 1e-300)) / gamma
    t = np.sqrt(2 * nu) * d
    out = (2.0 ** (1 - nu) / sgamma(nu)) * (t ** nu) * skv(nu, t)
    out[d < 1e-10] = 1.0
    return out


def main():
    from stpy_tpu.kernels import KernelFunction

    # 0.05 (not the v1 0.2): the reference-form Gibbs kernel has no PSD
    # prefactor, and at D=8 the 0.2 slope makes K indefinite (min eig −1.28
    # at n=8192 — the v1 host Cholesky crash); 0.05 keeps l ∈ [0.6, 1.0]
    # and K + s²I is PD (verified by host f64 Cholesky).
    def gamma_fun(x):
        return 0.6 + 0.05 * jnp.sum(x * x, axis=1)

    def gf64(x):
        return 0.6 + 0.05 * (x ** 2).sum(1)

    def gibbs64(a, b):
        la, lb = gf64(a)[:, None], gf64(b)[None, :]
        ls = la ** 2 + lb ** 2
        sq = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * sq / ls)

    run("gibbs",
        lambda: KernelFunction(kernel_name="gibbs", gamma_fun=gamma_fun,
                               d=D),
        gibbs64)
    poly64 = lambda a, b: (a @ b.T + 1.0) ** 3
    mk_poly = lambda: KernelFunction(kernel_name="polynomial", power=3, d=D)
    run("polynomial", mk_poly, poly64)
    run("polynomial", mk_poly, poly64, refine_steps=3)
    run("se+linear",
        lambda: (KernelFunction(kernel_name="squared_exponential",
                                gamma=0.7, d=D)
                 + KernelFunction(kernel_name="linear", d=D)),
        lambda a, b: (np.exp(-((a[:, None, :] - b[None, :, :]) ** 2
                               ).sum(-1) / (2 * 0.49)) + a @ b.T))
    # general-nu matern — the last family the double tier rejected (r5)
    run("matern_nu1.2",
        lambda: KernelFunction(kernel_name="matern", nu=1.2, gamma=0.8,
                               d=D),
        lambda a, b: matern_nu64(a, b, 0.8, 1.2))
    # fused-tier control row (known ~0.9 s-class from the serving table)
    run("se (fused)",
        lambda: KernelFunction(kernel_name="squared_exponential",
                               gamma=0.7, d=D),
        lambda a, b: np.exp(-((a[:, None, :] - b[None, :, :]) ** 2
                              ).sum(-1) / (2 * 0.49)),
        expect_generic=False)
    print("R5_GENERIC_ACC2_DONE", flush=True)


if __name__ == "__main__":
    main()
