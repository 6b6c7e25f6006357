"""Round-5 TPU batch — matrix-free df variance done-bar (VERDICT r5
task 5) + the mesh-double p=1 real-chip sanity wall (task 4).

Stages (ONE PER PROCESS — a TPU RESOURCE_EXHAUSTED wedges the client,
so in-process isolation is impossible; and the dense-double tier at
n=32k does not fit one chip: Th+Tl+A+L of the (hi,lo) Gram ≈ 17 GB,
so the largest co-feasible cross-check is n=24,576):

  se24k    dense-double vs lazy-double variance, se, n=24,576
  comp16k  same for the 2-atom composite at n=16,384
  n65k     beyond-dense-HBM lazy-double walls at n=65,536
  mesh     n=16,384 p=1 real-chip mesh-double sanity (task 4)

Run on the TPU host:
  timeout 7200 python benchmarks/exp_r5_lazy_double_var.py <stage>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

D, S = 8, 0.2


def force(*xs):
    for x in xs:
        float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def mkk():
    from stpy_tpu.kernels import KernelFunction

    return (KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                           d=D)
            + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=D))


def main():
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(0)

    # --- 1. lazy-double variance vs dense-double variance ---------------
    # The v1 script OOM'd: dense-double fit_predict at n=32k with the
    # 2-atom composite holds two (hi,lo) Gram pairs (~17 GB) before the
    # Cholesky buffer. Split the cross-check: (a) single-atom se at the
    # full n=32k (one df Gram pair, fits), falling back to n=24,576 if the
    # chip still can't hold it; (b) the 2-atom composite at n=16,384 where
    # both tiers are comfortable.
    def cross_check(kern_fn, n, t, tag):
        x = jnp.asarray(rng.uniform(-1, 1, (n, D)), jnp.float32)
        y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]), jnp.float32)
        xt = jnp.asarray(rng.uniform(-1, 1, (t, D)), jnp.float32)
        gp = GaussianProcess(kernel=kern_fn(), s=S, precision="double",
                             var_refine=1, jitter_ladder=False)
        t0 = time.perf_counter()
        mu_d, sd_d = gp.fit_predict(x, y, xt)
        force(sd_d)
        print(f"dense-double [{tag}] n={n} t={t}: fit+predict "
              f"{time.perf_counter() - t0:.1f}s inc compile", flush=True)
        mu_d = np.asarray(mu_d, np.float64)
        sd_d = np.asarray(sd_d, np.float64)
        gp.L = gp.A = gp._A_df = gp._df_train = None
        del gp

        ig = IterativeGP(kern_fn(), s=S, lazy=True, precision="double",
                         var_refine=1, tol=1e-6, maxiter=400)
        t0 = time.perf_counter()
        ig.fit_gp(x, y)
        force(ig.A)
        fit_w = time.perf_counter() - t0
        t0 = time.perf_counter()
        mu_l, sd_l = ig.mean_std(xt)
        force(sd_l)
        ms_w = time.perf_counter() - t0
        mu_l = np.asarray(mu_l, np.float64)
        sd_l = np.asarray(sd_l, np.float64)
        dv = (np.abs(sd_l.ravel() ** 2 - sd_d.ravel() ** 2)
              / (sd_d.ravel() ** 2))
        dm = np.max(np.abs(mu_l - mu_d)) / np.max(np.abs(mu_d))
        print(f"lazy-double [{tag}] n={n}: fit {fit_w:.1f}s, mean_std({t}) "
              f"{ms_w:.1f}s (inc compile) | vs dense-double: mean rel "
              f"{dm:.2e}, var rel max {dv.max():.2e} med "
              f"{np.median(dv):.2e}", flush=True)
        print(f"  fit_status: {ig.fit_status}", flush=True)
        del ig

    se_fn = lambda: KernelFunction(kernel_name="squared_exponential",
                                   gamma=0.5, d=D)
    # One stage per PROCESS (sys.argv): a TPU RESOURCE_EXHAUSTED wedges the
    # client, so in-process try/except cannot isolate stages (v2 log). The
    # dense-double tier at n=32k does NOT fit one chip (Th+Tl+A+L of the
    # (hi,lo) Gram ≈ 17 GB); the largest co-feasible cross-check is n=24576.
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("se24k", "all"):
        cross_check(se_fn, 24576, 1024, "se")
    if stage in ("comp16k", "all"):
        cross_check(mkk, 16384, 1024, "se+matern")
    if stage not in ("n65k", "mesh", "se24k", "comp16k", "all"):
        raise SystemExit(f"unknown stage {stage}")
    if stage not in ("n65k", "all") and stage != "mesh":
        print("R5_LAZY_DOUBLE_VAR_DONE", flush=True)
        return

    # --- 2. n=65,536: beyond-HBM walls ----------------------------------
    if stage in ("n65k", "all"):
        n2, t2 = 65536, 128
        x2 = jnp.asarray(rng.uniform(-1, 1, (n2, D)), jnp.float32)
        y2 = jnp.asarray(np.sin(3 * np.asarray(x2)[:, :1]), jnp.float32)
        xt2 = jnp.asarray(rng.uniform(-1, 1, (t2, D)), jnp.float32)
        ig2 = IterativeGP(mkk(), s=S, lazy=True, precision="double",
                          var_refine=1, tol=1e-6, maxiter=400)
        t0 = time.perf_counter()
        ig2.fit_gp(x2, y2)
        force(ig2.A)
        fit2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        mu2, sd2 = ig2.mean_std(xt2)
        force(sd2)
        ms2 = time.perf_counter() - t0
        ok = bool(np.all(np.isfinite(np.asarray(sd2))))
        print(f"lazy-double n={n2}: fit {fit2:.1f}s, df-variance mean_std"
              f"({t2}) {ms2:.1f}s (inc compile), finite={ok}, "
              f"df residuals {ig2.df_residuals}", flush=True)
        del ig2

    if stage == "n65k":
        print("R5_LAZY_DOUBLE_VAR_DONE", flush=True)
        return
    # --- 3. n=16,384 p=1 real-chip mesh-double sanity (task 4) ----------
    if stage in ("mesh", "all"):
        n3 = 16384
        x3 = jnp.asarray(rng.uniform(-1, 1, (n3, D)), jnp.float32)
        y3 = jnp.asarray(np.sin(3 * np.asarray(x3)[:, :1]), jnp.float32)
        xt3 = jnp.asarray(rng.uniform(-1, 1, (256, D)), jnp.float32)
        single = IterativeGP(mkk(), s=S, lazy=True, precision="double",
                             tol=1e-6, maxiter=400)
        single.fit_gp(x3, y3)
        mu_s = np.asarray(single.mean(xt3), np.float64)
        del single
        mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
        with mesh:
            im = IterativeGP(mkk(), s=S, mesh=mesh, axis="tp", lazy=True,
                             precision="double", tol=1e-6, maxiter=400)
            t0 = time.perf_counter()
            im.fit_gp(x3, y3)
            force(im.A)
            fit3 = time.perf_counter() - t0
            t0 = time.perf_counter()
            mu_m = im.mean(xt3)
            force(mu_m)
            mean3 = time.perf_counter() - t0
        dm3 = (np.max(np.abs(np.asarray(mu_m, np.float64) - mu_s))
               / np.max(np.abs(mu_s)))
        print(f"mesh-double p=1 n={n3}: fit {fit3:.1f}s, mean(256) "
              f"{mean3:.1f}s (inc compile) | vs single-chip double mean: "
              f"rel {dm3:.2e}", flush=True)
    print("R5_LAZY_DOUBLE_VAR_DONE", flush=True)


if __name__ == "__main__":
    main()
