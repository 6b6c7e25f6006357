"""Debug the config-4 backtracking regression (f32): zoom vs backtracking
vs batched on the exact config-4 MAP solve, CPU f32 (TPU semantics).

The on-chip run (logs_r5/config4_v2.log) fit total 12.707 vs true 4.778
after switching the count-record MAP solver's linesearch to backtracking;
this script reproduces the cold fit + 12 warm refits cycle per linesearch
and prints the drift.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp


def build():
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
    return est, hierarchy, process


def main():
    import stpy_tpu.point_processes.poisson_rate_estimator as pre
    from stpy_tpu.opt.lbfgs import minimize_lbfgs
    import functools

    # patchable variant of _map_count_record_lbfgs with linesearch arg
    @functools.partial(jax.jit,
                       static_argnames=("max_iter", "warm", "ls"))
    def solve(phis, observations, mult, invG_half, s, l, u, w0,
              max_iter=3000, G_half=None, warm=False, ls="zoom"):
        if warm:
            w0 = G_half @ w0
        phis_raw = phis @ invG_half
        obs_raw = observations @ invG_half
        eps = 1e-4
        l_arr = jnp.asarray(l) + eps
        span = jnp.asarray(u) - l_arr
        t0 = jnp.clip((w0 - l_arr) / span, 1e-4, 1 - 1e-4)
        z0 = jnp.log(t0) - jnp.log1p(-t0)

        def obj(z):
            w = l_arr + span * jax.nn.sigmoid(z)
            lam = jnp.clip(obs_raw @ w, 1e-12)
            reg = invG_half @ w
            return (
                -jnp.sum(mult * jnp.log(lam))
                + jnp.sum(phis_raw @ w)
                + 0.5 * s * jnp.sum(reg * reg)
            )

        clip = 9.21 if ls == "batched" else None
        res = minimize_lbfgs(obj, z0, max_iter=max_iter, tol=1e-9,
                             memory_size=30, xtol=1e-8, linesearch=ls,
                             step_clip=clip)
        w_star = l_arr + span * jax.nn.sigmoid(res.x)
        return w_star, invG_half @ w_star, res.iterations, res.value

    for ls in ["zoom", "backtracking", "batched"]:
        est, hierarchy, process = build()
        D = hierarchy.top_node
        true_total = process.rate_volume(D, dt=1.0)
        l, Lambda, u = est.get_constraints()
        G_half, invG_half = est.cov(inverse=True)
        args = (est.phis, est.observations, est.obs_multiplicities,
                invG_half, jnp.asarray(est.s, est.phis.dtype), l, u)
        # cold
        w0 = jnp.full((est.get_m(),), 0.1, est.phis.dtype)
        w, rate, it, val = solve(*args, w0, max_iter=1000, G_half=G_half,
                                 warm=False, ls=ls)
        tots = []
        est.rate = rate
        tots.append(float(est.mean_set(D)[0]))
        its = [int(it)]
        for _ in range(12):
            w, rate, it, val = solve(*args, rate.reshape(-1), max_iter=1000,
                                     G_half=G_half, warm=True, ls=ls)
            est.rate = rate
            tots.append(float(est.mean_set(D)[0]))
            its.append(int(it))
        print(f"ls={ls:13s} true={true_total:.4f} cold={tots[0]:.4f} "
              f"warm path: {['%.3f' % t for t in tots[1:]]}")
        print(f"   iters: {its}  final obj {float(val):.6f}")


if __name__ == "__main__":
    main()
