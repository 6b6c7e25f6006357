"""Round-2 experiment: predictive-VARIANCE accuracy paths at n=16k.

Baseline (r1): HIGHEST trisolve gives max vrel ~5e-4, HIGH ~9e-4 — the
target is max vrel < 1e-4. Candidates, all using a storage-exact df split
of K (best any Gram kernel can deliver):

  A. HIGHEST trisolve (baseline)
  B. df-refined trisolve: V_lo = L^{-1}(K* + K*_lo - L V_hi), variance from
     compensated df column sums
  C. z-form: refine A z = k* with df residuals, var = k** - df_dot(k*, z)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_var.py
"""

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import cho_solve_blocked, tri_solve_blocked
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

    def df_colsum_sq(Vh, Vl):
        """sum_i (Vh+Vl)_i^2 per column, compensated (f32 in, ~df out)."""
        ph, pe = two_prod(Vh, Vh)
        pe = pe + 2.0 * Vh * Vl
        # compensated column sum of (ph, pe) pairs via scan over rows in
        # chunks: tree-reduce hi and lo parts with TwoSum compensation
        def body(carry, rows):
            sh, sl = carry
            h, e = rows
            nh, ne = two_sum(sh, h)
            return (nh, ne + sl + e), None

        (sh, sl), _ = jax.lax.scan(
            body,
            (jnp.zeros(Vh.shape[1], Vh.dtype), jnp.zeros(Vh.shape[1], Vh.dtype)),
            (ph, pe),
        )
        return sh, sl

    def path_A(Kh, Kl):
        A = Kh + s2 * jnp.eye(n, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        V = tri_solve_blocked(L, Kh, precision=HI)
        return 1.0 - jnp.sum(V * V, axis=0)

    def path_B(Kh, Kl):
        A = Kh + s2 * jnp.eye(n, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        Vh = tri_solve_blocked(L, Kh, precision=HI)
        R = (Kh - jax.lax.dot(L, Vh, precision=HI)) + Kl
        Vl = tri_solve_blocked(L, R, precision=HI)
        sh, sl = df_colsum_sq(Vh, Vl)
        return (1.0 - sh) - sl

    def path_C(Kh, Kl):
        A = Kh + s2 * jnp.eye(n, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        Z = cho_solve_blocked(L, Kh)
        for _ in range(2):
            R = (Kh - (jax.lax.dot(Kh, Z, precision=HI) + s2 * Z)
                 ) - jax.lax.dot(Kl, Z, precision=HI)
            R = R + Kl
            Z = Z + cho_solve_blocked(L, R)
        # var = 1 - k*^T z with compensated dot (k* in df, z f32)
        ph, pe = two_prod(Kh, Z)
        pe = pe + Kl * Z

        def body(carry, rows):
            sh, sl = carry
            h, e = rows
            nh, ne = two_sum(sh, h)
            return (nh, ne + sl + e), None

        (sh, sl), _ = jax.lax.scan(
            body, (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)),
            (ph, pe),
        )
        return (1.0 - sh) - sl

    for tag, f in [("A HIGHEST trisolve", path_A),
                   ("B df-refined trisolve", path_B),
                   ("C refined z-form", path_C)]:
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
