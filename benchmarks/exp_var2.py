"""Round-2 experiment: compensated-GEMM refinement for predictive variance.

Path D = exp_var.py's refined z-form, but with the residual GEMM's
contraction dimension chunked and TwoSum-compensated
(ops/compensated.gemm_compensated) and the solution kept in double-float.
exp_var.py path C stalls at max vrel 1.7e-4 because the residual
R = K − (K + s²I)Z is computed with f32 GEMM accumulators (~1e-5 floor at
k=16k); chunked compensation drops that floor ~30x, which should carry the
variance to ~1e-5.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_var2.py
"""

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import cho_solve_blocked
from stpy_tpu.ops.compensated import gemm_compensated, dot_diag_df
from stpy_tpu.ops.pallas_gram_df import _make_eft
from stpy_tpu.utils.metrics import time_jitted

N = 16384
HI = jax.lax.Precision.HIGHEST


def main(n=N, d=8, gamma=0.5, s2=0.01):
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)

    print("building f64 reference ...", flush=True)
    nx = (xh * xh).sum(1)
    sq = nx[:, None] + nx[None, :] - 2.0 * (xh @ xh.T)
    np.maximum(sq, 0.0, out=sq)
    K64 = np.exp(-sq / (2 * gamma * gamma))
    del sq
    L64 = np.linalg.cholesky(K64 + s2 * np.eye(n))
    V64 = solve_triangular(L64, K64, lower=True)
    var64 = 1.0 - (V64**2).sum(0)
    del V64, L64

    Kh = jnp.asarray(K64, jnp.float32)
    Kl = jnp.asarray(K64 - np.asarray(Kh, np.float64), jnp.float32)

    two_sum, fast_two_sum, two_prod, df_add = _make_eft(True)

    def make_path_D(refines, chunk):
        def f(Kh, Kl):
            A = Kh + s2 * jnp.eye(n, dtype=jnp.float32)
            L = jnp.linalg.cholesky(A)
            Zh = cho_solve_blocked(L, Kh)
            Zl = jnp.zeros_like(Zh)
            for _ in range(refines):
                # R = (Kh + Kl) − (K + s²I)(Zh + Zl), hi product compensated
                Ph, Pl = gemm_compensated(Kh, Zh, chunk=chunk)
                small = (jax.lax.dot(Kh, Zl, precision=HI)
                         + jax.lax.dot(Kl, Zh, precision=HI)
                         + s2 * (Zh + Zl))
                Rh, Rl = two_sum(Kh, -Ph)
                Rl = Rl + (Kl - Pl - small)
                dZ = cho_solve_blocked(L, Rh + Rl)
                Zh, Zl = df_add(Zh, Zl, dZ, jnp.zeros_like(dZ))
            # var = 1 − diag(K*ᵀ Z), K* = K (training points), df dot
            sh, sl = dot_diag_df(Kh, Kl, Zh, Zl)
            return (1.0 - sh) - sl
        return f

    import sys
    variants = [
        ("D refines=1 chunk=512", make_path_D(1, 512)),
        ("D refines=2 chunk=512", make_path_D(2, 512)),
        ("D refines=1 chunk=256", make_path_D(1, 256)),
    ]
    if len(sys.argv) > 1:  # e.g. "256" -> only the chunk-256 variant
        variants = [v for v in variants if sys.argv[1] in v[0]]
    for tag, f in variants:
        g = jax.jit(f)
        ct, rt = time_jitted(g, Kh, Kl, reps=3)
        var = np.asarray(g(Kh, Kl), np.float64)
        vrel = np.abs(var - var64) / np.maximum(var64, 1e-12)
        print(f"{tag:24s} [{rt*1e3:5.0f}ms, compile {ct:4.0f}s] "
              f"max {np.max(vrel):.2e} med {np.median(vrel):.2e} "
              f"p99 {np.quantile(vrel, 0.99):.2e}", flush=True)
    print("var64 stats: min %.2e med %.2e" % (var64.min(), np.median(var64)),
          flush=True)


if __name__ == "__main__":
    main()
