"""Full benchmark harness — the five BASELINE.json configs.

Prints one JSON line per config plus a summary; `python benchmarks/run_all.py`.
(bench.py at the repo root stays the driver's single-metric entry point.)

Configs (BASELINE.json):
  1. 1-D exact GP regression, RBF, n=1024, evidence-maximization hyperfit
  2. 2-D Fourier-feature GP, m=512: posterior sampling vs exact GP
  3. Nyström / kernelized-features ridge, n=50k, additive + Matérn algebra
  4. Poisson point-process intensity on 2-D Borel sets, positive basis
  5. Cox-process MKL with 64 vmapped hyperparameter restarts
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    """Force completion by scalar readback — block_until_ready is a no-op
    through the remote-TPU tunnel (measured: returns in 0 ms for a 7 s
    computation), so only a host read truly synchronizes."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    _force(out)
    return time.perf_counter() - t0, out


# repeat/noise discipline (VERDICT r3 task 5): one timing per config is
# indistinguishable from the ±0.5 s tunnel noise the rounds kept waving
# away — every config now reports median + IQR over REPS warm runs, so a
# real regression is visible against the measured spread.
REPS = int(os.environ.get("RUN_ALL_REPS", "5"))


def _timed_stats(fn):
    """Median + IQR over REPS warm runs (first call outside = compile)."""
    walls = []
    out = None
    for _ in range(REPS):
        w, out = _timed(fn)
        walls.append(w)
    walls = np.asarray(walls)
    return {
        "wall_s": round(float(np.median(walls)), 4),
        "wall_iqr_s": round(float(np.percentile(walls, 75)
                                  - np.percentile(walls, 25)), 4),
        "wall_min_s": round(float(walls.min()), 4),
        "wall_max_s": round(float(walls.max()), 4),
        "reps": int(REPS),
    }, out


def config1_exact_gp_hyperfit():
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    n = 1024
    x = rng.uniform(-1, 1, (n, 1))
    y = np.sin(4 * x) + 0.05 * rng.standard_normal((n, 1))
    gp = GaussianProcess(gamma=1.0, s=0.05, d=1)
    gp.fit_gp(x, y)

    def run():
        gp.optimize_params(type="bandwidth", restarts=8, maxiter=40)
        return gp.L

    _timed(run)      # warm-up: compile the vmapped L-BFGS program
    stats, _ = _timed_stats(run)
    gamma = float(gp.kernel_object.params_dict["0"]["gamma"])
    hm = getattr(gp, "hyperopt_metrics", {})
    return {
        "config": "1d_exact_gp_n1024_evidence_hyperfit",
        **stats,
        "fitted_gamma": round(gamma, 4),
        "lbfgs_iters": hm.get("iterations", np.array([])).tolist(),
        "converged": hm.get("converged", np.array([])).astype(int).tolist(),
    }


def config2_ff_vs_exact():
    from stpy_tpu.embeddings import HermiteEmbedding
    from stpy_tpu.models import GaussianProcess, KernelizedFeatures

    rng = np.random.default_rng(1)
    n = 512
    x = rng.uniform(-1, 1, (n, 2))
    y = np.sin(3 * x[:, :1]) * np.cos(2 * x[:, 1:])
    xt = rng.uniform(-1, 1, (1024, 2))

    # the exact GP is the comparison BASELINE here: use the accurate
    # variance-solve knob so the measured error is the FF approximation's
    gp = GaussianProcess(gamma=0.5, s=0.05, d=2,
                         var_precision=jax.lax.Precision.HIGHEST)
    gp.fit_gp(x, y)
    mu_e, std_e = gp.mean_std(xt)

    emb = HermiteEmbedding(gamma=0.5, m=512, d=2)
    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.05, d=2)

    def run():
        F.fit_gp(x, y)
        mu, std = F.mean_std(xt)
        f = F.sample(xt, size=64, key=jax.random.PRNGKey(0))
        return mu, std, f

    _timed(run)      # warm-up (compile)
    stats, (mu, std, f) = _timed_stats(run)
    return {
        "config": "2d_ff_gp_m512_posterior_sampling",
        **stats,
        "mu_err_vs_exact": float(jnp.abs(mu - mu_e).max()),
        "std_err_vs_exact": float(jnp.abs(std - std_e).max()),
    }


def config3_nystrom_50k():
    from stpy_tpu.embeddings import NystromFeatures
    from stpy_tpu.kernels import KernelFunction

    rng = np.random.default_rng(2)
    n = 50_000
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    y = (np.sin(3 * x[:, :1]) + x[:, 1:]).astype(np.float32)
    # additive + Matérn kernel arithmetic
    k = (
        KernelFunction(kernel_name="matern", gamma=0.4, nu=1.5, d=2,
                       group=[0])
        + KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=2,
                         group=[1])
    )
    nf = NystromFeatures(k, m=512, approx="uniform", s=0.05)

    def run():
        nf.fit_gp(x, y)
        mu, std = nf.mean_std(x[:2048])
        return mu

    _timed(run)      # warm-up (compile)
    stats, mu = _timed_stats(run)
    resid = float(jnp.abs(mu - y[:2048]).mean())
    return {
        "config": "nystrom_ridge_n50k_additive_matern",
        **stats,
        "train_mae_head": round(resid, 4),
    }


def config4_poisson_2d():
    from stpy_tpu.domains import HierarchicalBorelSets
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.point_processes import (
        PoissonPointProcess,
        PoissonRateEstimator,
    )

    hierarchy = HierarchicalBorelSets(
        2, [[-1.0, 1.0], [-1.0, 1.0]], levels=3
    )
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=2)
    process = PoissonPointProcess(
        d=2, B=3.0,
        rate=lambda x, dt=1.0: (2.5 * jnp.exp(
            -jnp.sum(x**2, axis=1, keepdims=True) * 2
        ) + 0.3) * dt,
    )
    # map_max_iter=1000: the L-BFGS runs to its cap on these ~1e12-curvature
    # box objectives, so the cap is the wall knob — fitted totals are
    # IDENTICAL at 1000/1500/3000 (CPU sweep, r3) and the r2 regression
    # (0.7 → 1.2 s) was exactly this cap's cost on-device (VERDICT item 9).
    est = PoissonRateEstimator(
        process, hierarchy, d=2, m=8, kernel_object=k, B=4.0, s=1e-3,
        map_max_iter=1000,
    )
    key = jax.random.PRNGKey(0)
    data = []
    for S in hierarchy.get_sets_level(3):
        key, sub = jax.random.split(key)
        obs = process.sample_discretized(sub, S, 20.0, n=16)
        data.append((S, obs, 20.0))
    est.load_data(data)

    def run():
        est.fit_gp()
        return est.rate

    _timed(run)      # warm-up (compile)
    stats, _ = _timed_stats(run)
    D = hierarchy.top_node
    fitted_total = float(est.mean_set(D)[0])
    true_total = process.rate_volume(D, dt=1.0)
    # f32 quality gate (VERDICT r1 item 4): with the host-f64 cov() fix the
    # f32 MAP matches f64 exactly on identical data, so the fitted total
    # must sit inside the statistical band of the realization.
    quality_ok = abs(fitted_total - true_total) / true_total < 0.10
    return {
        "quality_ok_10pct": bool(quality_ok),
        "config": "poisson_2d_positive_basis_quadrature",
        **stats,
        "fitted_total_rate": round(fitted_total, 3),
        "true_total_rate": round(true_total, 3),
    }


def config5_cox_mkl_64restarts():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(4)
    n = 256
    x = rng.uniform(-1, 1, (n, 1))
    # log-Gaussian Cox surrogate: log-intensity observations
    y = np.log(2.5 * np.exp(-4 * x**2) + 0.3) + 0.05 * rng.standard_normal(
        (n, 1)
    )
    gp = GaussianProcess(gamma=1.0, s=0.05, d=1)
    gp.fit_gp(x, y)

    def run():
        # 64 restarts = ONE vmapped on-device L-BFGS (BASELINE config 5)
        gp.optimize_params(type="bandwidth", restarts=64, maxiter=40)
        return gp.L

    _timed(run)      # warm-up (compile)
    stats, _ = _timed_stats(run)
    hm = getattr(gp, "hyperopt_metrics", {})
    iters = hm.get("iterations", np.array([]))
    return {
        "config": "cox_mkl_hyperopt_64_vmapped_restarts",
        **stats,
        "fitted_gamma": round(
            float(gp.kernel_object.params_dict["0"]["gamma"]), 4
        ),
        "lbfgs_iters_mean": float(iters.mean()) if iters.size else None,
        "lbfgs_iters_max": int(iters.max()) if iters.size else None,
        "n_converged": int(hm.get("converged", np.array([])).sum()),
    }


def main():
    results = []
    for fn in [
        config1_exact_gp_hyperfit,
        config2_ff_vs_exact,
        config3_nystrom_50k,
        config4_poisson_2d,
        config5_cox_mkl_64restarts,
    ]:
        res = fn()
        results.append(res)
        print(json.dumps(res), flush=True)
    total = sum(r["wall_s"] for r in results)
    print(json.dumps({"summary": "all_configs", "total_wall_s": round(total, 3)}))
    return results


if __name__ == "__main__":
    main()
