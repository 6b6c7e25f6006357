"""Round-3 TPU batch M — anatomy of the double/var_refine pipeline.

The VERDICT item-6 done-bar is `precision="double", var_refine=1`
fit+predict ≤ 0.7 s at n = 16,384 with var max ≤ 5e-6; batch G measured
0.78–0.88 s. This batch answers two questions with one compiled pipeline
per knob setting:

  M1. WHERE the 0.8 s goes — per-stage warm walls for: train df Gram,
      Cholesky, initial alpha solve, each df iterative-refinement step,
      test cross df Gram, df mean GEMV, the W0 cho_solve, and the fused
      df quadratic form.
  M2. WHICH stages the accuracy actually needs — mean/var error vs the
      cached f64 host reference (C1 se config) across a knob grid:
        ir ∈ {1, 2, 3} refinement steps,
        W0 solve precision ∈ {DEFAULT, HIGH}.
      The second-order identity says var error ~ (W0 residual)², so a
      DEFAULT W0 (bf16 GEMMs, ~3x the HIGH rate) may survive. The qform
      main product stays HIGHEST: Mosaic's dot lowering supports only
      DEFAULT and HIGHEST inside Pallas kernels (HIGH raised
      NotImplementedError on the first attempt), and DEFAULT's 8-bit
      mantissa main product would cost ~3 digits of q.

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference, sq64, acc

N, D, S = 16384, 8, 0.1


def _stage(fn, *args):
    """Run jitted `fn` twice (compile + warm), return (warm_seconds, out)."""
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.sum(jnp.abs(leaf)))
    t0 = time.perf_counter()
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.sum(jnp.abs(leaf)))
    return time.perf_counter() - t0, out


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.linalg import cho_solve_blocked, safe_cholesky
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.ops.compensated import gemv_df
    from stpy_tpu.ops.pallas_gram_df import _two_prod, _two_sum
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    HI = jax.lax.Precision.HIGHEST
    HIGH = jax.lax.Precision.HIGH
    DEF = jax.lax.Precision.DEFAULT

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(
        lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25)), xh, yh, xt, S,
        cache=f"c1_se_{N}")

    gp = GaussianProcess(
        kernel=KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                              d=D), s=S, precision="double", var_refine=1)
    desc = gp._df_atom_desc()
    pd = gp.kernel_object.params_dict
    sj = jnp.float32(S)

    gram_train = jax.jit(lambda a: gp._df_gram(pd, a, a, desc))
    gram_cross = jax.jit(lambda a, b: gp._df_gram(pd, a, b, desc))

    @jax.jit
    def chol(Kh):
        A = Kh + sj * sj * jnp.eye(N, dtype=Kh.dtype)
        return safe_cholesky(A).L

    @jax.jit
    def alpha0(L):
        return cho_solve_blocked(L, y)

    @jax.jit
    def ir_step(L, Kh, Kl, a_h, a_l):
        s2h, s2e = _two_prod(sj, sj)
        Ph, Pl = gemv_df(Kh, Kl, a_h, vl=a_l)
        qh, qe = _two_prod(s2h, a_h)
        qe = qe + (s2e * a_h + s2h * a_l)
        rh, re = _two_sum(y, -Ph[:, None])
        rh, re2 = _two_sum(rh, -qh)
        r = rh + ((re + re2) - Pl[:, None] - qe)
        d = cho_solve_blocked(L, r)
        nh, e = _two_sum(a_h, d)
        return nh, a_l + e

    @jax.jit
    def mean_gemv(Bh, Bl, a_h, a_l):
        Mh, Ml = gemv_df(Bh, Bl, a_h, vl=a_l)
        return Mh + Ml

    def w0_solve(L, BhT, prec):
        return cho_solve_blocked(L, BhT, precision=prec)

    w0_jits = {p: jax.jit(lambda L, B, p=p: w0_solve(L, B, p))
               for p in (DEF, HIGH)}

    def qform(Kh, Kl, W0, BhT, BlT, prec):
        return qform_refined(Kh, Kl, W0, BhT, BlT, sj, main_precision=prec)

    qf_jits = {p: jax.jit(lambda a, b, c, d2, e, p=p: qform(a, b, c, d2, e, p))
               for p in (HI,)}

    kss = np.asarray(gp.kernel_object.diag(xtj, pd), np.float64)

    # ---- M1: stage walls (base config) --------------------------------
    tg, (Kh, Kl) = _stage(gram_train, x)
    tc, L = _stage(chol, Kh)
    ta, a_h = _stage(alpha0, L)
    a_l = jnp.zeros_like(a_h)
    tir, (a_h, a_l) = _stage(ir_step, L, Kh, Kl, a_h, a_l)
    for _ in range(2):
        a_h, a_l = ir_step(L, Kh, Kl, a_h, a_l)
    float(jnp.sum(jnp.abs(a_h)))
    tx, (Bh, Bl) = _stage(gram_cross, xtj, x)
    BhT, BlT = Bh.T, Bl.T
    tm, mu = _stage(mean_gemv, Bh, Bl, a_h, a_l)
    tw_hi, W0 = _stage(w0_jits[HIGH], L, BhT)
    tw_def, W0d = _stage(w0_jits[DEF], L, BhT)
    tq_hi, (qh, ql) = _stage(qf_jits[HI], Kh, Kl, W0, BhT, BlT)
    print(f"M1 walls (s): train-gram {tg:.3f}  chol {tc:.3f}  alpha0 {ta:.3f}"
          f"  ir-step {tir:.3f} (x3)  cross-gram {tx:.3f}  mean {tm:.3f}"
          f"  W0-HIGH {tw_hi:.3f}  W0-DEFAULT {tw_def:.3f}"
          f"  qform-HIGHEST {tq_hi:.3f}", flush=True)
    base_total = tg + tc + ta + 3 * tir + tx + tm + tw_hi + tq_hi
    print(f"M1 base-config stage sum: {base_total:.3f} s", flush=True)

    # ---- M2: accuracy grid ---------------------------------------------
    def run(ir, w0_prec, qf_prec, tag):
        ah = alpha0(L)
        al = jnp.zeros_like(ah)
        for _ in range(ir):
            ah, al = ir_step(L, Kh, Kl, ah, al)
        mu_ = mean_gemv(Bh, Bl, ah, al)
        W = w0_jits[w0_prec](L, BhT)
        qh_, ql_ = qf_jits[qf_prec](Kh, Kl, W, BhT, BlT)
        var = np.maximum(
            (np.asarray(kss, np.float64)
             - np.asarray(qh_, np.float64)) - np.asarray(ql_, np.float64),
            1e-30)
        sd = np.sqrt(var)
        mrel, vmax, vmed = acc(np.asarray(mu_), sd, mu64, var64)
        print(f"M2 {tag}: mean rel {mrel:.2e}  var max {vmax:.2e} "
              f"med {vmed:.2e}", flush=True)

    run(3, HIGH, HI, "ir=3 W0=HIGH (base)")
    run(2, HIGH, HI, "ir=2 W0=HIGH")
    run(1, HIGH, HI, "ir=1 W0=HIGH")
    run(3, DEF, HI, "ir=3 W0=DEFAULT")
    run(2, DEF, HI, "ir=2 W0=DEFAULT")
    print("BATCHM_DONE", flush=True)


if __name__ == "__main__":
    main()
