"""Round-3 TPU batch B — var_refine cost (item 6) and trisolve precision
sweep (item 7), with accuracy vs an f64 host reference at n=16k.

  B1. precision='double', var_refine∈{0,1}: WARM fit+predict wall and
      mean/var errors (after the r3 tree-reduction + HIGH-solve rework).
  B2. precision='single' with var_precision ∈ {DEFAULT, HIGH, HIGHEST}:
      warm fit+predict wall + var errors — is DEFAULT inside the r2
      quality gate (var max ~6.9e-4)?

Run (holds the TPU): timeout 4800 python benchmarks/exp_r3_batch_b.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import solve_triangular

import jax
import jax.numpy as jnp


def force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    force(out)
    return time.perf_counter() - t0, out


def main(n=16384, d=8, gamma=0.5, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)

    def k64(a, b):
        na = (a * a).sum(1)
        nb = (b * b).sum(1)
        sq = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
        np.maximum(sq, 0.0, out=sq)
        return np.exp(-sq / (2 * gamma * gamma))

    print(f"building f64 reference n={n} ...", flush=True)
    K = k64(xh, xh)
    L64 = np.linalg.cholesky(K + s * s * np.eye(n))
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    Ks = k64(xt, xh)
    mu64 = (Ks @ a64).ravel()
    V64 = solve_triangular(L64, Ks.T, lower=True)
    var64 = np.maximum(1.0 - (V64**2).sum(0), 1e-30)
    del K, L64, V64, Ks

    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xtj = jnp.asarray(xt, jnp.float32)

    def report(tag, gp):
        gp.fit_gp(x, y)
        timed(lambda: gp.mean_std(xtj))                        # compile
        wall, (mu, sd) = timed(
            lambda: (gp.fit_gp(x, y), gp.mean_std(xtj))[-1]
        )                                                      # warm e2e
        mu = np.asarray(mu, np.float64).ravel()
        sd = np.asarray(sd, np.float64).ravel()
        mean_rel = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
        vrel = np.abs(sd**2 - var64) / np.maximum(var64, 1e-12)
        print(f"{tag:24s} warm fit+predict {wall:.3f}s  "
              f"mean rel {mean_rel:.2e}  var max {np.max(vrel):.2e} "
              f"med {np.median(vrel):.2e}", flush=True)

    print("\n=== B1 double / var_refine (post-r3 rework) ===", flush=True)
    for vr in (0, 1, 2):
        try:
            report(f"double vr={vr}",
                   GaussianProcess(gamma=gamma, s=s, d=d,
                                   precision="double", var_refine=vr))
        except Exception:
            traceback.print_exc()

    print("\n=== B2 single / var_precision sweep ===", flush=True)
    for name, prec in (("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH(None)", None),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)):
        try:
            report(f"single var_prec={name}",
                   GaussianProcess(gamma=gamma, s=s, d=d,
                                   var_precision=prec))
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
