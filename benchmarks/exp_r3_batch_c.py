"""Round-3 TPU batch C — re-measurement after the r3 reworks.

Sections (pass section names as argv to select; default: all):
  C1. double-mode accuracy+wall at n=16k for se / matern32 / se+matern,
      var_refine ∈ {0, 1} — with the compensated fit residual and the
      fused df quadratic form (VERDICT items 4+6 done-bars: mean ≤1e-6,
      vr=1 ≤0.7 s with var max ≤5e-6).
  C2. bench-pipeline variant sweep at n=16k (item 7): leaf-batched
      trisolve, alpha folded into the wide forward solve, chol_recursive
      vs XLA Cholesky, nb sweep — each with accuracy vs host f64.
  C3. DistributedExactGP n=32k real-chip panels retry (item 3; the a2
      attempt OOMed before the no-pad mask-skip fix).
  C4. n=65k lazy sum-kernel CG with the pivoted-Cholesky preconditioner
      (item 2; unpreconditioned stalled at 4.7e-2 in 400 iters).

Run on the TPU host, nothing else TPU-side in parallel:
  timeout 5400 python benchmarks/exp_r3_batch_c.py C1 C2
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


def host_reference(k64, xh, yh, xt, s, cache=None):
    """f64 posterior reference; ~10 min at n=16k (single-thread trisolve),
    so cache to disk keyed by `cache` — reruns of a killed batch reuse it."""
    if cache is not None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f".ref_{cache}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return z["mu64"], z["var64"]
    K = k64(xh, xh)
    n = K.shape[0]
    L64 = np.linalg.cholesky(K + s * s * np.eye(n))
    a64 = solve_triangular(
        L64.T, solve_triangular(L64, yh, lower=True), lower=False
    )
    Ks = k64(xt, xh)
    mu64 = (Ks @ a64).ravel()
    kss = np.diag(k64(xt[:1], xt[:1]))[0]
    V64 = solve_triangular(L64, Ks.T, lower=True)
    var64 = np.maximum(kss - (V64**2).sum(0), 1e-30)
    if cache is not None:
        np.savez(path, mu64=mu64, var64=var64)
    return mu64, var64


def acc(mu, sd, mu64, var64):
    mu = np.asarray(mu, np.float64).ravel()
    sd = np.asarray(sd, np.float64).ravel()
    mean_rel = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
    vrel = np.abs(sd**2 - var64) / np.maximum(var64, 1e-12)
    return mean_rel, np.max(vrel), np.median(vrel)


def c1_double_accuracy(n=16384, d=8, s=0.1, gp_kwargs=None, tag=""):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))

    cases = [
        ("se", lambda: KernelFunction(kernel_name="squared_exponential",
                                      gamma=0.5, d=d),
         lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25))),
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
        mu64, var64 = host_reference(k64, xh, yh, xt, s,
                                     cache=f"c1_{name}_{n}")
        for vr in (0, 1):
            try:
                gp = GaussianProcess(kernel=mk(), s=s, precision="double",
                                     var_refine=vr, **(gp_kwargs or {}))
                gp.fit_gp(x, y)
                force(gp.mean_std(xtj))                      # compile
                wall, (mu, sd) = timed(
                    lambda: (gp.fit_gp(x, y), gp.mean_std(xtj))[-1]
                )
                m, vmax, vmed = acc(mu, sd, mu64, var64)
                print(f"{name:10s} double{tag} vr={vr}  warm {wall:6.3f}s  "
                      f"mean rel {m:.2e}  var max {vmax:.2e} med {vmed:.2e}",
                      flush=True)
            except Exception:
                traceback.print_exc()


def c2_bench_variants(n=16384, d=8, gamma=0.5, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.linalg import (
        chol_recursive, cho_solve_blocked, diag_block_invs, safe_cholesky,
        tri_solve_blocked, tri_solve_blocked_t,
    )

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    print("building f64 reference ...", flush=True)

    def k64(a, b):
        return np.exp(-sq64(a, b) / (2 * gamma * gamma))

    mu64, var64 = host_reference(k64, xh, yh, xt, s, cache=f"c2_se_{n}")
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    kernel = KernelFunction(kernel_name="squared_exponential", gamma=gamma,
                            d=d)
    pd = kernel.params_dict
    HI = jax.lax.Precision.HIGHEST

    def pipeline(x, y, xt, *, chol, nb, fold_alpha):
        K = kernel.eval_params(pd, x, x)
        K = K + (s * s) * jnp.eye(n, dtype=K.dtype)
        L = chol(K)
        Ks = kernel.eval_params(pd, xt, x)
        Dinv = diag_block_invs(L, nb)
        if fold_alpha:
            Z = tri_solve_blocked(L, jnp.concatenate([y, Ks.T], axis=1),
                                  nb=nb, leaf_inv=Dinv)
            zy, V = Z[:, :1], Z[:, 1:]
            alpha = tri_solve_blocked_t(L, zy, nb=nb, leaf_inv=Dinv)
        else:
            alpha = cho_solve_blocked(L, y, nb=nb, leaf_inv=Dinv)
            V = tri_solve_blocked(L, Ks.T, nb=nb, leaf_inv=Dinv)
        mu = jax.lax.dot(Ks, alpha, precision=HI)
        var = jnp.maximum(kernel.diag(xt, pd) - jnp.sum(V * V, axis=0),
                          1e-30)
        return mu, jnp.sqrt(var)

    chol_xla = lambda K: safe_cholesky(K).L
    chol_rec = lambda K: chol_recursive(K, nb=2048)
    chol_rec_hi = lambda K: chol_recursive(
        K, nb=2048, precision=jax.lax.Precision.HIGH)

    variants = [
        ("base nb512 (leafbatch)", dict(chol=chol_xla, nb=512,
                                        fold_alpha=False)),
        ("fold_alpha nb512", dict(chol=chol_xla, nb=512, fold_alpha=True)),
        ("fold+cholrec nb512", dict(chol=chol_rec, nb=512, fold_alpha=True)),
        ("fold+cholrecHIGH nb512", dict(chol=chol_rec_hi, nb=512,
                                        fold_alpha=True)),
        ("fold_alpha nb384", dict(chol=chol_xla, nb=384, fold_alpha=True)),
        ("fold_alpha nb768", dict(chol=chol_xla, nb=768, fold_alpha=True)),
    ]
    for name, kw in variants:
        try:
            f = jax.jit(lambda x, y, xt, kw=kw: pipeline(x, y, xt, **kw))
            force(f(x, y, xtj))                              # compile
            walls = []
            for _ in range(3):
                w, (mu, sd) = timed(lambda: f(x, y, xtj))
                walls.append(w)
            m, vmax, vmed = acc(mu, sd, mu64, var64)
            print(f"{name:26s} {np.median(walls):6.4f}s  mean rel {m:.2e}  "
                  f"var max {vmax:.2e} med {vmed:.2e}", flush=True)
        except Exception:
            traceback.print_exc()


def c3_dist_32k(n=16384, d=2, s=0.1):
    # n=16384 (not 32k): at p=1 the panels path's explicit per-device state
    # is K_rows + L + panel workspace ≈ 3·n² — 12 GB at 32k, which OOMs
    # one 16 GB chip (measured twice). Single-chip 32k belongs to the
    # DENSE jitter_ladder=False path (613 ms, RESULTS.md); the O(n²/p)
    # law itself is measured on the 8-virtual-device mesh
    # (exp_dist_capacity). This run is the real-chip sanity of the
    # sharded path.
    from jax.sharding import Mesh
    from stpy_tpu.kernels import KernelFunction
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
    print(f"dist n={n} panels p=1: fit {wall_fit:.1f}s (inc compile), "
          f"predict {wall_pred:.1f}s, peak {peak:.2f} GiB, "
          f"mu[:3]={np.asarray(mu[:3]).ravel().round(4)}", flush=True)


def c4_lazy_sum_65k(n=65536, d=3, s=0.2, rank=512):
    # rank 512 + the SPD eigenform apply (the f32 Cholesky-Woodbury apply
    # at this scale was effectively indefinite and made PCG WORSE —
    # lowrank_eigen_precond docstring has the numbers)
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
                     precond_rank=rank)
    wall, _ = timed(lambda: (gp.fit_gp(x, y), gp.A)[-1])
    print(f"lazy sum-kernel n=65k precond rank={rank}: fit {wall:.1f}s "
          f"(inc compile), {gp.cg_iterations} CG iters, "
          f"residual {gp.cg_residual:.1e}", flush=True)


SECTIONS = {"C1": c1_double_accuracy, "C2": c2_bench_variants,
            "C3": c3_dist_32k, "C4": c4_lazy_sum_65k}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    for nm in names:
        print(f"\n=== {nm} ===", flush=True)
        try:
            SECTIONS[nm]()
        except Exception:
            traceback.print_exc()
