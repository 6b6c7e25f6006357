"""Export run_all.py config 4's EXACT sensing data to an npz so
exp_reference_walls5.py fits the reference on IDENTICAL data (VERDICT r3
task 3 comparability: the first walls5 run drew uniform points per leaf,
which is a different data law — fitted totals 11.8 vs 5.0 were
incomparable).

CPU-only jax (safe alongside a TPU job).
Run: python benchmarks/export_config4_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from stpy_tpu.domains import HierarchicalBorelSets
    from stpy_tpu.point_processes import PoissonPointProcess

    hierarchy = HierarchicalBorelSets(2, [[-1.0, 1.0], [-1.0, 1.0]],
                                      levels=3)
    process = PoissonPointProcess(
        d=2, B=3.0,
        rate=lambda x, dt=1.0: (2.5 * jnp.exp(
            -jnp.sum(x ** 2, axis=1, keepdims=True) * 2) + 0.3) * dt,
    )
    key = jax.random.PRNGKey(0)
    bounds, pts, counts = [], [], []
    for S in hierarchy.get_sets_level(3):
        key, sub = jax.random.split(key)
        obs = process.sample_discretized(sub, S, 20.0, n=16)
        bounds.append(np.asarray(S.bounds, np.float64))
        if obs is None:
            pts.append(np.zeros((0, 2)))
            counts.append(0)
        else:
            pts.append(np.asarray(obs, np.float64))
            counts.append(pts[-1].shape[0])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".config4_data.npz")
    np.savez(out, bounds=np.stack(bounds),
             points=np.concatenate(pts) if pts else np.zeros((0, 2)),
             counts=np.asarray(counts, np.int64), dt=20.0)
    print(f"wrote {out}: {sum(counts)} events over {len(counts)} leaves",
          flush=True)


if __name__ == "__main__":
    main()
