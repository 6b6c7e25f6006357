"""Round-4 TPU batch — localize the qform kernel-arithmetic error (a).

exp_r4_varfloor found the refined-variance floor is term (a): the Pallas
qform's OWN arithmetic vs an f64 evaluation of the same df inputs (se max
3.75e-6 rel-to-var; df input noise (b) is ~1e-9 and irrelevant). This
batch splits (a) into the kernel's three numeric stages by emulating the
k-step loop in plain XLA and combining partials exactly on host:

  E1  main-product in-dot rounding: Σ_k f64(dot_HIGHEST(Th_k, W0_k))
      vs f64(Th·W0) — the f32 accumulation INSIDE each 512-deep MXU dot,
      which the kernel's across-tile TwoSum cannot see;
  E2  lo-correction pass: Σ_k f64(dot_bf16(Tl_k, W0_k)) vs f64(Tl·W0) —
      the DEFAULT-precision (one bf16 pass) corr product;
  E3  the remainder (kernel vs exact-partial emulation): the EFT
      accumulate/finalize chain itself.

Whichever dominates at the worst columns decides the fix: finer in-kernel
k-chunking (E1), a bf16x3 corr pass (E2), or an EFT bug hunt (E3).

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_qform_stage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference, sq64

N, D, S = 16384, 8, 0.1
BK = 512        # kernel block_k


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.kernels.df_plan import df_gram_from_desc
    from stpy_tpu.linalg import cho_solve_blocked
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    def k64(a, b):
        return np.exp(-sq64(a, b) / (2 * 0.25))

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(k64, xh, yh, xt, S, cache=f"c1_se_{N}")

    gp = GaussianProcess(
        kernel=KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                              d=D),
        s=S, precision="double", var_refine=1)
    gp.fit_gp(x, y)
    _, sd = gp.mean_std(xtj)
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    print(f"full-t var rel err max {vrel.max():.2e} med {np.median(vrel):.2e}",
          flush=True)

    worst = np.argsort(-vrel)[:384]
    rand = rng.choice(N, 128, replace=False)
    sel = np.unique(np.concatenate([worst, rand]))
    t = len(sel)
    xtsj = jnp.asarray(xt[sel], jnp.float32)

    desc = gp._df_atom_desc()
    aug = gp.kernel_object.params_with_lo()
    Th, Tl = gp._df_train
    Bh, Bl = df_gram_from_desc(gp.kernel_object, aug, xtsj, x, desc)
    W0 = cho_solve_blocked(gp.L, Bh.T, precision=jax.lax.Precision.HIGH)
    qh, ql = qform_refined(Th, Tl, W0, Bh.T, Bl.T, jnp.asarray(S, x.dtype))
    q_kernel = np.asarray(qh, np.float64) + np.asarray(ql, np.float64)

    v = var64[sel]

    # ---- exact f64 of the same df inputs --------------------------------
    Th64, Tl64 = np.asarray(Th, np.float64), np.asarray(Tl, np.float64)
    W64 = np.asarray(W0, np.float64)
    B64 = np.asarray(Bh, np.float64).T + np.asarray(Bl, np.float64).T
    main64 = Th64 @ W64
    corr64 = Tl64 @ W64
    A_W = main64 + corr64 + S * S * W64
    q_f64 = np.sum(W64 * (2.0 * B64 - A_W), axis=0)
    print(f"(a) kernel vs f64     rel-to-var max "
          f"{np.max(np.abs((q_kernel - q_f64) / v)):.2e} "
          f"med {np.median(np.abs((q_kernel - q_f64) / v)):.2e}", flush=True)

    # ---- E1/E2: per-k-tile dots in XLA, combined exactly on host --------
    ks = N // BK

    @jax.jit
    def tile_dots(Thj, Tlj, W0j):
        ps, cs = [], []
        for kk in range(ks):
            a = jax.lax.dynamic_slice(Thj, (0, kk * BK), (N, BK))
            al = jax.lax.dynamic_slice(Tlj, (0, kk * BK), (N, BK))
            w = jax.lax.dynamic_slice(W0j, (kk * BK, 0), (BK, t))
            ps.append(jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
            cs.append(jax.lax.dot_general(
                al.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT))
        return jnp.stack(ps), jnp.stack(cs)

    P_, C_ = tile_dots(Th, Tl, W0)
    P64 = np.asarray(P_, np.float64).sum(axis=0)
    C64 = np.asarray(C_, np.float64).sum(axis=0)

    e1 = np.sum(W64 * (main64 - P64), axis=0)       # in-dot rounding -> q
    e2 = np.sum(W64 * (corr64 - C64), axis=0)       # corr bf16 error -> q
    # kernel vs exact-partial emulation (EFT chain + W0 bf16 conv in corr
    # are inside e3)
    q_emul = np.sum(W64 * (2.0 * B64 - (P64 + C64 + S * S * W64)), axis=0)
    e3 = q_kernel - q_emul
    for name, e in (("E1 in-dot rounding", e1), ("E2 corr bf16 pass", e2),
                    ("E3 EFT chain rest", e3)):
        print(f"  {name:22s} rel-to-var max {np.max(np.abs(e / v)):.2e} "
              f"med {np.median(np.abs(e / v)):.2e}", flush=True)

    # E1 at finer k-chunking: does a 128-deep dot cut the in-dot error?
    @jax.jit
    def tile_dots_128(Thj, W0j):
        ps = []
        for kk in range(N // 128):
            a = jax.lax.dynamic_slice(Thj, (0, kk * 128), (N, 128))
            w = jax.lax.dynamic_slice(W0j, (kk * 128, 0), (128, t))
            ps.append(jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        return jnp.stack(ps)

    P128 = np.asarray(tile_dots_128(Th, W0), np.float64).sum(axis=0)
    e1b = np.sum(W64 * (main64 - P128), axis=0)
    print(f"  E1 @ block_k=128       rel-to-var max "
          f"{np.max(np.abs(e1b / v)):.2e} med {np.median(np.abs(e1b / v)):.2e}",
          flush=True)
    print("R4_QFORM_STAGE_DONE", flush=True)


if __name__ == "__main__":
    main()
