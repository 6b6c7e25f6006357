"""Round-5 TPU batch — settle config 4 honestly (VERDICT r5 task 6).

r4 measured 0.082 s (IQR 0.025) vs the reference's 0.043 s and blamed
"2-3 tunnel dispatches" without proof. This script:
  1. COUNTS the device calls in the timed region (jax.core.Primitive.bind
     interception — warm reps don't retrace, so every bind is an eager op
     launch or a pjit call);
  2. measures the per-call dispatch floor (tiny no-op round trip);
  3. measures the warm MAP wall gross (with the quality readback, the
     run_all discipline) and submit-amortized (K enqueued solves, one
     readback — the device-compute estimate through an async tunnel);
  4. re-measures after the r5 fusion fixes (warm start folded into the
     jitted solve, constraints/s cached).

Run on the TPU host: timeout 3600 python benchmarks/exp_r5_config4.py
"""

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_config4():
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


def force(x):
    float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def main():
    est, hierarchy, process = build_config4()

    # dispatch floor: one tiny jitted op + readback, median of 21
    tiny = jax.jit(lambda a: jnp.sum(a * a))
    xsmall = jnp.ones((8,), jnp.float32)
    force(tiny(xsmall))
    floors = []
    for _ in range(21):
        t0 = time.perf_counter()
        force(tiny(xsmall))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"dispatch floor (tiny jit + scalar readback): "
          f"{floor * 1e3:.1f} ms (min {min(floors) * 1e3:.1f})", flush=True)

    # warm-up: compile the MAP program(s) — cold + first warm (warm=True
    # uses a second program)
    est.fit_gp()
    force(est.rate)
    est.fit_gp()
    force(est.rate)

    # 1. bind-count one warm rep (no retrace → every bind is a launch)
    binds = Counter()
    orig_bind = jax.extend.core.Primitive.bind

    def counting_bind(self, *args, **kw):
        binds[self.name] += 1
        return orig_bind(self, *args, **kw)

    jax.extend.core.Primitive.bind = counting_bind
    try:
        est.fit_gp()
        force(est.rate)
    finally:
        jax.extend.core.Primitive.bind = orig_bind
    total = sum(binds.values())
    print(f"device calls in one warm timed rep (bind count): {total} — "
          f"{dict(binds)}", flush=True)

    # 2. gross wall, run_all discipline (5 reps, median/IQR)
    walls = []
    for _ in range(9):
        t0 = time.perf_counter()
        est.fit_gp()
        force(est.rate)
        walls.append(time.perf_counter() - t0)
    walls = np.asarray(walls)
    print(f"gross warm wall (fit + quality readback): median "
          f"{np.median(walls) * 1e3:.1f} ms  IQR "
          f"{(np.percentile(walls, 75) - np.percentile(walls, 25)) * 1e3:.1f}"
          f" ms  min {walls.min() * 1e3:.1f} ms", flush=True)

    # 3. submit-amortized device compute: enqueue K solves, force once
    from stpy_tpu.point_processes.poisson_rate_estimator import (
        _map_count_record_lbfgs,
    )

    l, Lambda, u = est.get_constraints()
    G_half, invG_half = est.cov(inverse=True)
    args = (est.phis, est.observations, est.obs_multiplicities, invG_half,
            est._s_dev, l, u, est.rate.reshape(-1))
    out = _map_count_record_lbfgs(*args, max_iter=est.map_max_iter,
                                  G_half=G_half, warm=True)
    force(out[1])
    K = 20
    t0 = time.perf_counter()
    outs = [_map_count_record_lbfgs(*args, max_iter=est.map_max_iter,
                                    G_half=G_half, warm=True)
            for _ in range(K)]
    force(outs[-1][1])
    amort = (time.perf_counter() - t0) / K
    print(f"submit-amortized MAP solve ({K} enqueued, one readback): "
          f"{amort * 1e3:.2f} ms/solve (net-of-dispatch device estimate)",
          flush=True)

    # quality gate (same as run_all)
    D = hierarchy.top_node
    fitted_total = float(est.mean_set(D)[0])
    true_total = process.rate_volume(D, dt=1.0)
    print(f"fitted total {fitted_total:.3f} vs true {true_total:.3f} "
          f"(gate |d|/true < 0.10: "
          f"{abs(fitted_total - true_total) / true_total < 0.10})",
          flush=True)
    print("R5_CONFIG4_DONE", flush=True)


if __name__ == "__main__":
    main()
