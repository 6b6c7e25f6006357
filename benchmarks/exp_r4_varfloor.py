"""Round-4 TPU batch — decompose the refined-variance error floor
(VERDICT r3 task 1).

The shipped config (double, var_refine=1) measures var rel err max
3.4e-6 (se) / 2.3e-6 (matern32) at n=16k against the 1e-6 BASELINE bar.
r3 ATTRIBUTED the floor to df Gram entry noise through w0ᵀ·dA·w0 but
never validated the attribution. This batch separates the floor into its
three physically distinct terms, at the ACTUAL worst test points:

    var_err = [q_kernel − q̃_f64(same df inputs)]      (a) kernel arithmetic
            + [q̃_f64(df inputs) − q̃_f64(true A, B)]   (b) df input noise
            + [q̃_f64(true) − q_exact]                 (c) identity bias
                                                          (− δᵀAδ, 2nd order)

where q̃(A, B, W0) = Σ W0 ⊙ (2B − A·W0 − s²W0) and q_exact = kss − var64.

(a) is the Pallas qform's own error (HIGHEST main product's in-pass f32
accumulation + EFT tail); (b) is dA/dB entry noise through the quadratic
form (first order — r3's hypothesis); (c) is the second-order residual
term the identity knowingly keeps (negative ⇒ conservative variance).
Whichever matches the observed max tells round 4 what (if anything) can
close the last digit — and if (b)+(c) dominate, the floor model is
validated and becomes the published accounting.

Selection: the worst-256 rel-err test points (vs the cached f64
reference) plus 256 random ones, so both max and median behavior appear.

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_varfloor.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference, matern64, sq64

N, D, S = 16384, 8, 0.1


def decompose(name, mk, k64, gamma_desc):
    from stpy_tpu.kernels.df_plan import df_gram_from_desc
    from stpy_tpu.linalg import cho_solve_blocked
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(k64, xh, yh, xt, S, cache=f"c1_{name}_{N}")

    gp = GaussianProcess(kernel=mk(), s=S, precision="double", var_refine=1)
    gp.fit_gp(x, y)
    _, sd = gp.mean_std(xtj)
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    print(f"{name}: full-t var rel err max {vrel.max():.2e} "
          f"med {np.median(vrel):.2e}", flush=True)

    worst = np.argsort(-vrel)[:256]
    rand = rng.choice(N, 256, replace=False)
    sel = np.unique(np.concatenate([worst, rand]))
    xts = xt[sel]
    xtsj = jnp.asarray(xts, jnp.float32)

    # production pieces for the selected columns
    desc = gp._df_atom_desc()
    aug = gp.kernel_object.params_with_lo()
    Th, Tl = gp._df_train                     # (n, n) df train Gram
    Bh, Bl = df_gram_from_desc(gp.kernel_object, aug, xtsj, x, desc)
    W0 = cho_solve_blocked(gp.L, Bh.T, precision=jax.lax.Precision.HIGH)
    qh, ql = qform_refined(Th, Tl, W0, Bh.T, Bl.T, jnp.asarray(S, x.dtype))
    q_kernel = np.asarray(qh, np.float64) + np.asarray(ql, np.float64)

    # --- host f64 evaluations -----------------------------------------
    A_df = (np.asarray(Th, np.float64) + np.asarray(Tl, np.float64)
            + S * S * np.eye(N))
    W = np.asarray(W0, np.float64)
    B_df = np.asarray(Bh, np.float64).T + np.asarray(Bl, np.float64).T
    q_df = np.sum(W * (2.0 * B_df - A_df @ W), axis=0)
    del A_df

    A_true = k64(xh, xh) + S * S * np.eye(N)
    B_true = k64(xts, xh).T
    q_true = np.sum(W * (2.0 * B_true - A_true @ W), axis=0)
    del A_true

    kss = np.diag(k64(xts[:1], xts[:1]))[0]
    q_exact = kss - var64[sel]
    v = var64[sel]

    terms = {
        "(a) kernel arith": (q_kernel - q_df) / v,
        "(b) df input dA/dB": (q_df - q_true) / v,
        "(c) identity bias": (q_true - q_exact) / v,
        "total": (q_kernel - q_exact) / v,
    }
    for k, t in terms.items():
        print(f"  {k:20s} rel-to-var max {np.max(np.abs(t)):.2e} "
              f"med {np.median(np.abs(t)):.2e} "
              f"(signed at worst pt {t[np.argmax(np.abs(terms['total']))]:+.2e})",
              flush=True)
    # where does the observed max sit in t-space / variance scale
    iw = sel[np.argmax(np.abs(terms["total"]))]
    print(f"  worst point: var64 {var64[iw]:.3e} "
          f"(var range [{var64.min():.3e}, {var64.max():.3e}])", flush=True)


def main():
    from stpy_tpu.kernels import KernelFunction

    decompose(
        "se",
        lambda: KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                               d=D),
        lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25)), "gamma=0.5 exact",
    )
    decompose(
        "matern32",
        lambda: KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5,
                               d=D),
        lambda a, b: matern64(sq64(a, b), 0.8, 1.5), "gamma=0.8 inexact",
    )
    print("R4_VARFLOOR_DONE", flush=True)


if __name__ == "__main__":
    main()
