"""Round-3 TPU measurement batch A (VERDICT r2 items 2/3/4/6/9).

One process, sections independent (each in try/except):
  A1. double-mode accuracy at n=16k for matern-3/2 and se+matern composite
      (item 4 done-bar: <= 1e-6 mean rel err vs f64 host).
  A2. DistributedExactGP n=32k on a 1-device real-chip mesh (panels
      factorization): wall, device memory_stats peak, mean parity vs the
      single-chip dense path (item 3 real-chip sanity).
  A3. n=65k matrix-free fit with a SUM kernel (se + matern) — lazy CG fit
      + 3 hyperfit steps (item 2 TPU measurement).
  A4. config-4 warm-fit breakdown (item 9 regression hunt).
  A5. var_refine=1 component timing at n=16k (item 6 planning).

Run on the TPU host (holds the chip — nothing else TPU-side in parallel):
  timeout 3000 python benchmarks/exp_r3_batch_a.py
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


def section(name):
    print(f"\n=== {name} ===", flush=True)


def sq64(a, b):
    na = (a * a).sum(1)
    nb = (b * b).sum(1)
    sq = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
    np.maximum(sq, 0.0, out=sq)
    return sq


def matern64(sq, gamma, nu, kappa=1.0):
    t = np.sqrt(2.0 * nu * sq) / gamma
    P = {0.5: 1.0, 1.5: 1.0 + t, 2.5: 1.0 + t + t * t / 3.0}[nu]
    return kappa * (P * np.exp(-t) if nu != 0.5 else np.exp(-t))


def a1_double_accuracy(n=16384, d=8, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))

    cases = [
        ("matern32", lambda: KernelFunction(kernel_name="matern", gamma=0.8,
                                            nu=1.5, d=d),
         lambda a, b: matern64(sq64(a, b), 0.8, 1.5)),
        ("se+matern", lambda: (
            KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
            + KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5, d=d)),
         lambda a, b: (np.exp(-sq64(a, b) / (2 * 0.25))
                       + matern64(sq64(a, b), 1.1, 2.5))),
    ]
    for name, mk, k64 in cases:
        print(f"building f64 reference for {name} ...", flush=True)
        K = k64(xh, xh)
        L64 = np.linalg.cholesky(K + s * s * np.eye(n))
        a64 = solve_triangular(
            L64.T, solve_triangular(L64, yh, lower=True), lower=False
        )
        Ks = k64(xt, xh)
        mu64 = (Ks @ a64).ravel()
        kss = float(k64(xt[:1], xt[:1])[0, 0])
        V64 = solve_triangular(L64, Ks.T, lower=True)
        var64 = np.maximum(kss - (V64**2).sum(0), 1e-30)
        del K, L64, V64, Ks

        for mode in ("single", "double"):
            gp = GaussianProcess(kernel=mk(), s=s, precision=mode)
            wall, _ = timed(lambda: (gp.fit_gp(x, y),
                                     gp.mean_std(xtj))[-1])
            mu, sd = gp.mean_std(xtj)
            mu = np.asarray(mu, np.float64).ravel()
            sd = np.asarray(sd, np.float64).ravel()
            mean_rel = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
            vrel = np.abs(sd**2 - var64) / np.maximum(var64, 1e-12)
            print(f"{name:10s} {mode:7s} [{wall:6.1f}s inc compile] "
                  f"mean rel {mean_rel:.2e}  var max {np.max(vrel):.2e} "
                  f"med {np.median(vrel):.2e}", flush=True)


def a2_dist_32k(n=32768, d=2, s=0.1):
    from jax.sharding import Mesh
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.parallel import DistributedExactGP

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1])
    xt = x[:1024]

    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
    gp = DistributedExactGP(k, s=s, mesh=mesh, nb=1024,
                            factorization="panels")
    wall_fit, _ = timed(lambda: gp.fit_gp(x, y).L)
    wall_pred, (mu, sd) = timed(lambda: gp.mean_std(xt))
    ms = jax.devices()[0].memory_stats() or {}
    peak = ms.get("peak_bytes_in_use", 0) / 2**30
    # parity vs the dense path is proven in tests at n<=4k; fitting a
    # second 32k GP here would OOM the chip alongside the sharded state
    print(f"dist n=32k panels p=1: fit {wall_fit:.1f}s (inc compile), "
          f"predict {wall_pred:.1f}s, peak {peak:.2f} GiB, "
          f"mu[:3]={np.asarray(mu[:3]).ravel().round(4)}", flush=True)


def a3_lazy_sum_65k(n=65536, d=3, s=0.2):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1]) + 0.1 * jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32
    )
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=d)
         + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=d))
    gp = IterativeGP(k, s=s, lazy=True, tol=1e-6, maxiter=400,
                     precond_rank=128)
    wall_fit, _ = timed(lambda: (gp.fit_gp(x, y), gp.A)[-1])
    print(f"lazy sum-kernel n=65k fit: {wall_fit:.1f}s inc compile, "
          f"{gp.cg_iterations} CG iters, residual {gp.cg_residual:.1e}",
          flush=True)
    t0 = time.perf_counter()
    out = gp.optimize_params(
        steps=3, lr=0.1, probes=64, tol=1e-4, cg_tol=1e-4, cg_maxiter=200,
        probe_tol=1e-2, probe_maxiter=60, key=jax.random.PRNGKey(0),
        refit=False,
    )
    wall_h = time.perf_counter() - t0
    print(f"lazy sum-kernel hyperfit 3 steps: {wall_h:.1f}s inc compile "
          f"(gammas {[round(float(np.asarray(g).ravel()[0]), 3) for g in out['gammas']]})",
          flush=True)


def a4_config4_breakdown():
    from stpy_tpu.domains import HierarchicalBorelSets
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.point_processes import (
        PoissonPointProcess, PoissonRateEstimator,
    )

    hierarchy = HierarchicalBorelSets(2, [[-1.0, 1.0], [-1.0, 1.0]],
                                      levels=3)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=2)
    process = PoissonPointProcess(
        d=2, B=3.0,
        rate=lambda x, dt=1.0: (2.5 * jnp.exp(
            -jnp.sum(x**2, axis=1, keepdims=True) * 2) + 0.3) * dt,
    )
    est = PoissonRateEstimator(process, hierarchy, d=2, m=8,
                               kernel_object=k, B=4.0, s=1e-3)
    key = jax.random.PRNGKey(0)
    data = []
    for S in hierarchy.get_sets_level(3):
        key, sub = jax.random.split(key)
        obs = process.sample_discretized(sub, S, 20.0, n=16)
        data.append((S, obs, 20.0))
    t0 = time.perf_counter()
    est.load_data(data)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    est.cov(inverse=True)
    t_cov = time.perf_counter() - t0
    w1, _ = timed(lambda: est.fit_gp() or est.rate)   # compile
    w2, _ = timed(lambda: est.fit_gp() or est.rate)   # warm
    w3, _ = timed(lambda: est.fit_gp() or est.rate)   # warm again
    print(f"config4: load {t_load:.2f}s  cov {t_cov:.2f}s  "
          f"fit cold {w1:.2f}s  warm {w2:.2f}s / {w3:.2f}s", flush=True)


def a5_var_refine_timing(n=16384, d=8, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1])
    for vr in (0, 1):
        gp = GaussianProcess(
            kernel=KernelFunction(kernel_name="squared_exponential",
                                  gamma=0.5, d=d),
            s=s, precision="double", var_refine=vr,
        )
        gp.fit_gp(x, y)
        timed(lambda: gp.mean_std(x))            # compile
        wall, _ = timed(lambda: gp.mean_std(x))  # warm
        wf, _ = timed(lambda: (gp.fit_gp(x, y), gp.mean_std(x))[-1])
        print(f"var_refine={vr}: warm predict {wall:.3f}s, "
              f"warm fit+predict {wf:.3f}s", flush=True)


SECTIONS = {
    "a1": a1_double_accuracy,
    "a2": a2_dist_32k,
    "a3": a3_lazy_sum_65k,
    "a4": a4_config4_breakdown,
    "a5": a5_var_refine_timing,
}

if __name__ == "__main__":
    # one section per PROCESS (run sequentially from the shell): TPU HBM is
    # not reliably reclaimed between sections in one process — the r3 first
    # attempt OOM'd a4/a5 after the 32k/65k sections
    names = sys.argv[1:] or list(SECTIONS)
    for name in names:
        section(name)
        try:
            SECTIONS[name]()
        except Exception:
            traceback.print_exc()
