"""Round-3 TPU batch I — decompose the composite-kernel double-mode mean
error (se+matern52 plateau ~1.25e-6 at n=16k that survived the exact
GEMV, the 1e-10 HLO-entry rework, AND the df alpha pair — batches C/D/F/G).

On 256 held-out rows, with everything pulled to host f64:

    e_total   = mu_dev − mu64
    e_alpha   = Ks64 · (alpha_dev − alpha64)       (fit/refinement error)
    e_entries = (Ks_dev − Ks64) · alpha_dev         (MOSAIC df cross-Gram
                                                    entry error — the HLO
                                                    path measured 1.6e-10,
                                                    the Mosaic kernel was
                                                    never measured per-entry
                                                    for matern52)
    e_gemv    = mu_dev − Ks_dev · alpha_dev         (mean GEMV error)

plus per-entry max |Ks_dev − Ks64| for each atom family separately.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_i.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import solve_triangular

import jax.numpy as jnp

N, D, S, T = 16384, 8, 0.1, 256


def sq64(a, b):
    na = (a * a).sum(1)
    nb = (b * b).sum(1)
    sq = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
    np.maximum(sq, 0.0, out=sq)
    return sq


def k64_se(a, b, g=0.5):
    return np.exp(-sq64(a / g, b / g) / 2.0)


def k64_m52(a, b, g=1.1):
    t = np.sqrt(5.0 * sq64(a / g, b / g))
    return (1.0 + t + t * t / 3.0) * np.exp(-t)


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)[:T]

    # host f64 reference
    K = k64_se(xh, xh) + k64_m52(xh, xh)
    L = np.linalg.cholesky(K + S * S * np.eye(N))
    alpha64 = solve_triangular(
        L.T, solve_triangular(L, yh, lower=True), lower=False).ravel()
    Ks64 = k64_se(xt, xh) + k64_m52(xt, xh)
    mu64 = Ks64 @ alpha64

    # device double-mode fit
    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xtj = jnp.asarray(xt, jnp.float32)
    kern = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
            + KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5, d=D))
    gp = GaussianProcess(kernel=kern, s=S, precision="double")
    gp.fit_gp(x, y)
    mu_dev, _ = gp.mean_std(xtj)
    mu_dev = np.asarray(mu_dev, np.float64).ravel()
    a_df = np.asarray(gp._A_df, np.float64)
    alpha_dev = a_df[:, 0] + a_df[:, 1]

    # device df cross-Gram rows (hi+lo) per atom and combined
    desc = gp._df_atom_desc()
    Ksh, Ksl = gp._df_gram(kern.params_dict, xtj, x, desc)
    Ks_dev = np.asarray(Ksh, np.float64) + np.asarray(Ksl, np.float64)

    from stpy_tpu.ops.pallas_gram_df import gram_df
    for name, fam, nu, g, ref in [
        ("se", "se", 1.0, 0.5, k64_se(xt, xh)),
        ("matern52", "matern", 2.5, 1.1, k64_m52(xt, xh)),
    ]:
        h, l = gram_df(xtj, x, g, 1.0, family=fam, nu=nu)
        dev = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        print(f"I1 {name:9s} Mosaic entry err: max {np.max(np.abs(dev - ref)):.2e}",
              flush=True)

    # single-precision fused Gram entries for comparison (shares the
    # Mosaic sqrt): calibrates the hardware sqrt/divide approximation
    se1 = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    m1 = KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5, d=D)
    for name, ko, ref in [("se", se1, k64_se(xt, xh)),
                          ("matern52", m1, k64_m52(xt, xh))]:
        dev = np.asarray(ko.eval_params(ko.params_dict, xtj, x), np.float64)
        print(f"I0 {name:9s} single-precision entry err: "
              f"max {np.max(np.abs(dev - ref)):.2e}", flush=True)
    print(f"I1 combined  entry err: max {np.max(np.abs(Ks_dev - Ks64)):.2e}",
          flush=True)

    scale = np.max(np.abs(mu64))
    e_total = np.max(np.abs(mu_dev - mu64)) / scale
    e_alpha = np.max(np.abs(Ks64 @ (alpha_dev - alpha64))) / scale
    e_entries = np.max(np.abs((Ks_dev - Ks64) @ alpha_dev)) / scale
    e_gemv = np.max(np.abs(mu_dev - Ks_dev @ alpha_dev)) / scale
    a_err = np.max(np.abs(alpha_dev - alpha64)) / np.max(np.abs(alpha64))
    print(f"I2 mean err decomposition (rel to max|mu64|): "
          f"total {e_total:.2e}  alpha-term {e_alpha:.2e}  "
          f"entry-term {e_entries:.2e}  gemv-term {e_gemv:.2e}  "
          f"(alpha rel err {a_err:.2e}, ||alpha||_1 "
          f"{np.abs(alpha64).sum():.1f})", flush=True)


if __name__ == "__main__":
    main()
