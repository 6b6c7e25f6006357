"""Round-5 TPU batch — closing serving table on the r5 SHIPPED defaults
(VERDICT r5 task 3).

r5 default change (models/exact_gp.py predict_refined): the W0 solve is
HIGHEST-forward / HIGH-backward for EVERY family (was HIGH single-atom /
HIGHEST composite). exp_r5_serving2 measured the mixed solve at
HIGHEST-class identity bias (matern32 3.63e-7, composite 3.75e-7) for
~the mean of the two costs. This script:

  A. re-runs the three-family accuracy/wall table through the REAL
     GaussianProcess(precision='double', var_refine=1) defaults
     (5 warm reps) — the closing rows for RESULTS.md;
  B. eager stage walls of the composite pipeline with the MIXED W0
     (forward HIGHEST + backward HIGH as separate stages) — the
     mandatory-stage roofline accounting for the ≤1.0 s verdict.

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_serving3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_r4_qform_fix import family, run

N, D, S = 16384, 8, 0.1


def force(*xs):
    for x in xs:
        float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def t(fn, label, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        force(*(out if isinstance(out, tuple) else (out,)))
        walls.append(time.perf_counter() - t0)
    print(f"  stage {label:30s} {min(walls):.3f}s "
          f"(med {np.median(walls):.3f})", flush=True)
    return out, float(min(walls))


def stages_composite_mixed():
    from stpy_tpu.kernels.df_plan import df_atom_desc, df_gram_from_desc
    from stpy_tpu.linalg import (
        cho_solve_blocked, chol_jittered, diag_block_invs,
        tri_solve_blocked, tri_solve_blocked_t,
    )
    from stpy_tpu.ops.compensated import gemv_df
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    H, HH = jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST
    mk, _ = family("se+matern")
    ko = mk()
    desc = df_atom_desc(ko)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    s = jnp.asarray(S, jnp.float32)

    print("composite stage walls, r5 mixed-W0 defaults (n=16k, eager, "
          "warm):", flush=True)
    pd = ko.params_with_lo()
    mand = 0.0
    gram = jax.jit(lambda a, b, p: df_gram_from_desc(ko, p, a, b, desc))
    _ = gram(x, x, pd); force(_[0])
    (Th, Tl), w = t(lambda: gram(x, x, pd), "train df gram (2 atoms)")
    mand += w
    A = Th + (s * s) * jnp.eye(N, dtype=jnp.float32)
    chol = jax.jit(chol_jittered)
    _ = chol(A); force(_)
    L, w = t(lambda: chol(A), "cholesky")
    mand += w
    solve = jax.jit(lambda L, b: cho_solve_blocked(L, b))
    _ = solve(L, y); force(_)
    a0, w = t(lambda: solve(L, y), "alpha0 solve")
    mand += w
    gemv = jax.jit(lambda Th, Tl, v: gemv_df(Th, Tl, v))
    _ = gemv(Th, Tl, a0[:, 0]); force(_[0])
    _, w = t(lambda: gemv(Th, Tl, a0[:, 0]), "ir residual df GEMV")
    mand += w
    cross = jax.jit(lambda a, b, p: df_gram_from_desc(ko, p, a, b, desc))
    _ = cross(xt, x, pd); force(_[0])
    (Kh, Kl), w = t(lambda: cross(xt, x, pd), "cross df gram (2 atoms)")
    mand += w
    _, w = t(lambda: gemv(Kh, Kl, a0[:, 0]), "mean df GEMV")
    mand += w
    dinv = jax.jit(lambda L: diag_block_invs(L, 512))
    _ = dinv(L); force(_)
    Dinv, w = t(lambda: dinv(L), "diag block invs")
    mand += w
    fw = jax.jit(lambda L, B, D_: tri_solve_blocked(
        L, B, nb=512, precision=HH, leaf_inv=D_))
    _ = fw(L, Kh.T, Dinv); force(_)
    Zf, w = t(lambda: fw(L, Kh.T, Dinv), "W0 forward trisolve HIGHEST")
    mand += w
    bw = jax.jit(lambda L, Z, D_: tri_solve_blocked_t(
        L, Z, nb=512, precision=H, leaf_inv=D_))
    _ = bw(L, Zf, Dinv); force(_)
    W0, w = t(lambda: bw(L, Zf, Dinv), "W0 backward trisolve HIGH")
    mand += w
    qf = jax.jit(lambda Th, Tl, W0, Bh, Bl: qform_refined(
        Th, Tl, W0, Bh, Bl, s, main_precision="ozaki"))
    _ = qf(Th, Tl, W0, Kh.T, Kl.T); force(_[0])
    _, w = t(lambda: qf(Th, Tl, W0, Kh.T, Kl.T), "qform ozaki")
    mand += w
    print(f"  mandatory-stage serial sum (eager mins): {mand:.3f}s",
          flush=True)


def main():
    # A. closing table on shipped defaults (W0 HIGHEST/HIGH mixed, r5)
    run("se", None, None, reps=5)
    run("matern32", None, None, reps=5)
    run("se+matern", None, None, reps=5)
    # B. composite roofline accounting
    stages_composite_mixed()
    print("R5_SERVING3_DONE", flush=True)


if __name__ == "__main__":
    main()
