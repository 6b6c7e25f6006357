"""Round-4 TPU batch — generic df tier accuracy on-chip (VERDICT r3
missing #1 done-bar: precision='double' accepts e.g. gibbs and polynomial
with a measured ≤5e-7 posterior-mean rel err at n=8k).

Families: gibbs (input-dependent lengthscale — exp/div through the jaxpr
df interpreter), polynomial degree 3 (integer_pow + dot_general df
rules), and se+linear (fused Pallas atom folded with a generic atom).
Reference: host numpy f64 of the same f32-rounded inputs.

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_generic_acc.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

N, D, S = 8192, 4, 0.1


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


def run(name, mk, k64, expect_generic=True):
    from stpy_tpu.kernels.df_plan import df_atom_desc
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    mu64, var64 = host_posterior(k64, xh, yh, xt, S)

    gp = GaussianProcess(kernel=mk(), s=S, precision="double", var_refine=1)
    # r5 (VERDICT task 2): assert the df_plan ROUTING this run exercises —
    # the named families must actually take the generic jaxpr-interpreter
    # tier, not a fused fast path
    fams = [f for (_, f, _, _, _, _) in df_atom_desc(gp.kernel_object)]
    if expect_generic:
        assert "generic" in fams, (name, fams)
    print(f"{name:12s} df_plan atom families: {fams}", flush=True)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    t0 = time.perf_counter()
    gp.fit_gp(x, y)
    mu, sd = gp.mean_std(xtj)
    float(jnp.sum(sd))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, sd = gp.fit_predict(x, y, xtj)
    float(jnp.sum(sd))
    warm = time.perf_counter() - t0
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    del gp
    # f32-tier wall on the same kernel/workload — the generic-df tier's
    # cost multiple (the docstring's "~5-10x" claim, measured at last)
    gps = GaussianProcess(kernel=mk(), s=S)
    mu1, sd1 = gps.fit_predict(x, y, xtj)
    float(jnp.sum(sd1))
    t0 = time.perf_counter()
    mu1, sd1 = gps.fit_predict(x, y, xtj)
    float(jnp.sum(sd1))
    warm_f32 = time.perf_counter() - t0
    m32 = (np.abs(np.asarray(mu1, np.float64).ravel() - mu64).max()
           / np.abs(mu64).max())
    print(f"{name:12s} mean rel {mrel:.2e}  var max {vrel.max():.2e} "
          f"med {np.median(vrel):.2e}  warm {warm:.2f}s (cold {cold:.1f}s) "
          f"| f32 tier: warm {warm_f32:.2f}s mean rel {m32:.2e} "
          f"| double/f32 cost x{warm / max(warm_f32, 1e-9):.1f}",
          flush=True)
    del gps


def main():
    from stpy_tpu.kernels import KernelFunction

    def gamma_fun(x):
        return 0.6 + 0.2 * jnp.sum(x * x, axis=1)

    def gf64(x):
        return 0.6 + 0.2 * (x ** 2).sum(1)

    def gibbs64(a, b):
        la, lb = gf64(a)[:, None], gf64(b)[None, :]
        ls = la ** 2 + lb ** 2
        sq = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * sq / ls)

    run("gibbs",
        lambda: KernelFunction(kernel_name="gibbs", gamma_fun=gamma_fun,
                               d=D),
        gibbs64)
    run("polynomial",
        lambda: KernelFunction(kernel_name="polynomial", power=3, d=D),
        lambda a, b: (a @ b.T + 1.0) ** 3)
    run("se+linear",
        lambda: (KernelFunction(kernel_name="squared_exponential",
                                gamma=0.7, d=D)
                 + KernelFunction(kernel_name="linear", d=D)),
        lambda a, b: (np.exp(-((a[:, None, :] - b[None, :, :]) ** 2
                               ).sum(-1) / (2 * 0.49)) + a @ b.T))
    # fused-tier comparison row (same n/d, pure fused Pallas df atom) —
    # the generic tier's cost multiple vs the FUSED df tier, not only f32
    run("se (fused)",
        lambda: KernelFunction(kernel_name="squared_exponential",
                               gamma=0.7, d=D),
        lambda a, b: np.exp(-((a[:, None, :] - b[None, :, :]) ** 2
                              ).sum(-1) / (2 * 0.49)),
        expect_generic=False)
    print("R4_GENERIC_ACC_DONE", flush=True)


if __name__ == "__main__":
    main()
