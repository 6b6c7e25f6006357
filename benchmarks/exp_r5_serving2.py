"""Round-5 TPU batch — the remaining serving-wall knobs before the
roofline verdict (VERDICT r5 task 3).

r5 baseline (exp_r5_serving.py): qform ozaki 0.591 s + W0 HIGHEST
0.340 s dominate the accuracy-mandated critical path (gram 0.135 →
chol 0.112 → W0 → qform ≈ 1.18 s serial). Variants measured here:
  * mixed W0: HIGHEST forward / HIGH backward and the reverse (~0.27 s)
    — does the identity bias (c) stay ≤ ~4e-7?
  * W0 HIGHEST at nb=1024 (leaf-count vs GEMM-efficiency trade)
  * qform ozaki with 1024-wide column tiles (block_n) and 1024-deep
    k tiles

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_serving2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference
from exp_r4_qform_fix import family

N, D, S = 16384, 8, 0.1
H, HH = jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST


def force(*xs):
    for x in xs:
        float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def run_variant(name, w0_fwd, w0_bwd, nb=512, qkw=None, reps=3):
    """Full double+vr1 pipeline with a MIXED-precision W0 solve and
    optional qform tile overrides, accuracy vs the cached f64 host ref."""
    from stpy_tpu.kernels.df_plan import df_atom_desc, df_gram_from_desc
    from stpy_tpu.linalg import (
        cho_solve_blocked, chol_jittered, diag_block_invs,
        tri_solve_blocked, tri_solve_blocked_t,
    )
    from stpy_tpu.ops.compensated import gemv_df
    from stpy_tpu.ops.pallas_gram_df import _two_prod, _two_sum
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    mk, k64 = family(name)
    ko = mk()
    desc = df_atom_desc(ko)
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(k64, xh, yh, xt, S, cache=f"c1_{name}_{N}")
    pd = ko.params_with_lo()
    s = jnp.asarray(S, jnp.float32)
    qkw = qkw or {}

    def pipeline(x, y, xtj, pd, s):
        n = x.shape[0]
        Th, Tl = df_gram_from_desc(ko, pd, x, x, desc)
        A = Th + (s * s) * jnp.eye(n, dtype=Th.dtype)
        L = chol_jittered(A)
        a_h = cho_solve_blocked(L, y)
        a_l = jnp.zeros_like(a_h)
        s2h, s2e = _two_prod(s, s)
        for _ in range(1):
            Ph, Pl = gemv_df(Th, Tl, a_h, vl=a_l)
            qh_, qe = _two_prod(s2h, a_h)
            qe = qe + (s2e * a_h + s2h * a_l)
            rh, re = _two_sum(y, -Ph[:, None])
            rh, re2 = _two_sum(rh, -qh_)
            r = rh + ((re + re2) - Pl[:, None] - qe)
            d = cho_solve_blocked(L, r)
            nh, e = _two_sum(a_h, d)
            a_h, a_l = nh, a_l + e
        Kh, Kl = df_gram_from_desc(ko, pd, xtj, x, desc)
        Mh, Ml = gemv_df(Kh, Kl, a_h, vl=a_l)
        mu = (Mh + Ml)[:, None]
        kss = ko.diag(xtj, pd)
        Dinv = diag_block_invs(L, nb)
        Zf = tri_solve_blocked(L, Kh.T, nb=nb, precision=w0_fwd,
                               leaf_inv=Dinv)
        W0 = tri_solve_blocked_t(L, Zf, nb=nb, precision=w0_bwd,
                                 leaf_inv=Dinv)
        qh, ql = qform_refined(Th, Tl, W0, Kh.T, Kl.T, s,
                               main_precision="ozaki", **qkw)
        var = jnp.maximum((kss - qh) - ql, 1e-30)
        return mu, jnp.sqrt(var)[:, None]

    fp = jax.jit(pipeline)
    mu, sd = fp(x, y, xtj, pd, s)
    force(sd)
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mu2, sd2 = fp(x, y, xtj, pd, s)
        force(sd2)
        walls.append(time.perf_counter() - t0)
    wn = {H: "HIGH", HH: "HIGHEST"}
    print(f"{name:10s} W0={wn[w0_fwd]:7s}/{wn[w0_bwd]:7s} nb={nb} "
          f"q={qkw or 'default'} mean rel {mrel:.2e} var max "
          f"{vrel.max():.2e} med {np.median(vrel):.2e} "
          f"fused wall {np.median(walls):.3f}s (min {min(walls):.3f})",
          flush=True)


def main():
    # mixed W0 directions on the composite (the (c)-dominant family)
    run_variant("se+matern", HH, H)
    run_variant("se+matern", H, HH)
    # matern32 margin candidates
    run_variant("matern32", HH, H)
    run_variant("matern32", H, HH)
    # block-size knobs at full HIGHEST W0
    run_variant("matern32", HH, HH, nb=1024)
    run_variant("matern32", HH, HH,
                qkw={"block_n": 1024})
    run_variant("matern32", HH, HH,
                qkw={"block_k": 1024})
    # reference rows: full HIGHEST / full HIGH through this runner (sanity
    # vs exp_r5_serving's GaussianProcess-path numbers)
    run_variant("matern32", HH, HH)
    run_variant("se+matern", HH, HH)
    print("R5_SERVING2_DONE", flush=True)


if __name__ == "__main__":
    main()
