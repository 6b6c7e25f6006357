"""Round-5 TPU batch — composite double serving ≤1.0 s + real matern32
margin (VERDICT r5 task 3).

Stage A: eager per-stage walls of the COMPOSITE (se+matern52) double
pipeline at n=16k (the batch-M anatomy, but for the 2-atom kernel whose
fused fit_predict sits at 1.22 s) — names where the 0.22 s over budget
lives: per-atom df Grams, chol, alpha+ir, cross Grams, mean GEMV, W0
solve at HIGH vs HIGHEST, ozaki qform.

Stage B: fused fit_predict walls + accuracy vs the cached f64 host
reference for the margin candidates:
  * matern32 with W0 HIGHEST (the VERDICT's ≥2x-margin candidate)
  * se+matern with W0 HIGHEST (current default, the 1.22 s row)
  * se+matern with W0 HIGH (how much the HIGHEST W0 costs/buys, re-check)

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_serving.py
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
    print(f"  stage {label:28s} {min(walls):.3f}s (med {np.median(walls):.3f})",
          flush=True)
    return out


def stages_composite():
    from stpy_tpu.kernels.df_plan import df_atom_desc, df_gram_from_desc
    from stpy_tpu.linalg import cho_solve_blocked, chol_jittered
    from stpy_tpu.ops.compensated import gemv_df
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    mk, _ = family("se+matern")
    ko = mk()
    desc = df_atom_desc(ko)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    s = jnp.asarray(S, jnp.float32)

    print("composite stage walls (n=16k, eager, warm):", flush=True)
    pd = ko.params_with_lo()
    gram = jax.jit(lambda a, b, p: df_gram_from_desc(ko, p, a, b, desc))
    _ = gram(x, x, pd); force(_[0])   # compile
    Th, Tl = t(lambda: gram(x, x, pd), "train df gram (2 atoms)")
    A = Th + (s * s) * jnp.eye(N, dtype=jnp.float32)
    chol = jax.jit(chol_jittered)
    _ = chol(A); force(_)
    L = t(lambda: chol(A), "cholesky")
    solve = jax.jit(lambda L, b: cho_solve_blocked(L, b))
    _ = solve(L, y); force(_)
    a0 = t(lambda: solve(L, y), "alpha0 solve")
    gemv = jax.jit(lambda Th, Tl, v: gemv_df(Th, Tl, v))
    _ = gemv(Th, Tl, a0[:, 0]); force(_[0])
    t(lambda: gemv(Th, Tl, a0[:, 0]), "ir residual df GEMV")
    cross = jax.jit(lambda a, b, p: df_gram_from_desc(ko, p, a, b, desc))
    _ = cross(xt, x, pd); force(_[0])
    Kh, Kl = t(lambda: cross(xt, x, pd), "cross df gram (2 atoms)")
    t(lambda: gemv(Kh, Kl, a0[:, 0]), "mean df GEMV")
    for prec, nm in ((jax.lax.Precision.HIGH, "HIGH"),
                     (jax.lax.Precision.HIGHEST, "HIGHEST")):
        sv = jax.jit(lambda L, B: cho_solve_blocked(L, B, precision=prec))
        _ = sv(L, Kh.T); force(_)
        W0 = t(lambda: sv(L, Kh.T), f"W0 cho_solve {nm}")
    qf = jax.jit(lambda Th, Tl, W0, Bh, Bl: qform_refined(
        Th, Tl, W0, Bh, Bl, s, main_precision="ozaki"))
    _ = qf(Th, Tl, W0, Kh.T, Kl.T); force(_[0])
    t(lambda: qf(Th, Tl, W0, Kh.T, Kl.T), "qform ozaki")


def main():
    stages_composite()
    H, HH = jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST
    # margin/wall candidates (accuracy vs cached f64 references)
    run("matern32", None, HH)      # the >=2x matern margin candidate
    run("matern32", None, None)    # shipped default (W0 HIGH), re-baseline
    run("se+matern", None, None)   # shipped default (W0 HIGHEST) = 1.22 s row
    run("se+matern", None, H)      # how much HIGHEST W0 costs/buys
    run("se", None, None)          # re-baseline
    print("R5_SERVING_DONE", flush=True)


if __name__ == "__main__":
    main()
