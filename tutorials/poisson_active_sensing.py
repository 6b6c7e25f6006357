"""Tutorial 3: active sensing of an inhomogeneous Poisson process.

The flagship stpy workflow (reference call stack: sense -> fit -> UCB ->
sample, SURVEY.md §3.4): a sensor picks one region per round, pays
observation time there, and the estimator's UCB decides where to look next.
Everything runs on device — the MAP fit is a sigmoid-reparameterized L-BFGS
over the positive triangle basis, the per-region UCBs come from the Laplace
ellipsoid, and posterior rate samples come from a proximal Langevin chain
(`lax.scan`, prox = box clip).

Run: python tutorials/poisson_active_sensing.py   (CPU-friendly sizes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# point-process MAP fits are small and condition-sensitive: run x64 on CPU
# (the big-GP tutorials run f32 on TPU; see docs/DESIGN.md §5)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from stpy_tpu.domains import HierarchicalBorelSets
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.point_processes import PoissonPointProcess, PoissonRateEstimator

key = jax.random.PRNGKey(7)

# ground truth: smooth bump rate on [-1, 1], B = peak rate
process = PoissonPointProcess(d=1, B=4.0, b=0.5)
hierarchy = HierarchicalBorelSets(1, [[-1.0, 1.0]], levels=4)
actions = hierarchy.get_sets_level(4)          # 16 leaf cells to sense

kernel = KernelFunction(kernel_name="squared_exponential", gamma=0.3, d=1)
est = PoissonRateEstimator(
    process, hierarchy, d=1, m=32, kernel_object=kernel, B=5.0, s=1e-4,
    uncertainty="laplace",
)

# seed round: one short sweep of everything, then UCB-driven rounds
dt = 10.0
data = []
for S in actions:
    key, sub = jax.random.split(key)
    data.append((S, process.sample_discretized(sub, S, dt, n=64), dt))
est.load_data(data)
est.fit_gp()

vols = np.array([float(S.volume()) for S in actions])
for rnd in range(6):
    # batched bounds: ONE vmapped ellipsoid-slice solve for all actions
    _, ucbs, _ = est.ucb_lcb_actions(actions, dt=1.0)
    ucbs = np.asarray(ucbs) / vols
    pick = int(np.argmax(ucbs))                 # optimism in face of uncertainty
    S = actions[pick]
    key, sub = jax.random.split(key)
    obs = process.sample_discretized(sub, S, dt, n=64)
    est.add_data_point((S, obs, dt))
    est.fit_gp()
    print(f"round {rnd}: sensed cell {pick:2d} "
          f"[{float(S.bounds[0][0]):+.2f}, {float(S.bounds[0][1]):+.2f}] "
          f"ucb={ucbs[pick]:.2f}")

# report: estimated vs true rate on a grid + a posterior sample
xt = hierarchy.top_node.return_discretization(256)
est_rate = np.asarray(est.mean_rate_points(xt)).ravel()
true_rate = np.asarray(process.rate(xt)).ravel()
rel = np.abs(est_rate - true_rate).mean() / true_rate.mean()
print(f"mean relative rate error after active sensing: {rel:.3f}")

est.sample(steps=300)
samp = np.asarray(est.sample_path(hierarchy.top_node, n=256)).ravel()
print(f"posterior Langevin sample: min {samp.min():.3f} (positivity), "
      f"max {samp.max():.3f} vs true peak {true_rate.max():.3f}")
