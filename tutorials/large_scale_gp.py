"""Tutorial 4: exact-GP inference beyond HBM — the matrix-free path.

Three tiers of scale on ONE chip (numbers from a TPU v5e, f32):

  n ≤ ~40k   : dense path — `GaussianProcess` (Pallas Gram + Cholesky +
               blocked trisolve). n=16k fit + 16k predict: 0.22 s.
  n ≤ ~10⁶   : matrix-free — `IterativeGP(lazy=True)` runs CG against a
               fused Pallas Gram·v kernel (K is never materialized; memory
               is O(n)). n=65,536 solve to 1e-6: ~7 s (182 iterations).
  hyperopt   : `evidence_value_and_grad_lazy` — BBMM-style evidence
               gradients from CG + 128 Hutchinson probes (one block solve).
               n=65,536: 14 s per gradient step, warm.

This script runs CPU-sized versions of all three so it executes anywhere:

    python tutorials/large_scale_gp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU-sized demo: pin to CPU + x64 (the TPU-scale numbers quoted above come
# from the f32 path; env JAX_PLATFORMS does not override a preloaded jax)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess
from stpy_tpu.parallel import IterativeGP, evidence_value_and_grad_lazy

rng = np.random.default_rng(0)
n, d = 2000, 3
x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
y = jnp.asarray(np.sin(np.asarray(x) @ np.array([3.0, 2.0, 0.5]))[:, None]
                + 0.1 * rng.standard_normal((n, 1)))
xt = jnp.asarray(rng.uniform(-1, 1, (200, d)))

k = KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=d)

# ---- tier 1: dense exact GP ------------------------------------------------
gp = GaussianProcess(kernel=k, s=0.1)
gp.fit_gp(x, y)
mu_d, std_d = gp.mean_std(xt)

# ---- tier 2: matrix-free exact GP (same posterior, no dense K) --------------
igp = IterativeGP(k, s=0.1, lazy=True, tol=1e-10, maxiter=1000)
igp.fit_gp(x, y)
mu_l, std_l = igp.mean_std(xt, method="exact")
print(f"lazy CG: {igp.cg_iterations} iterations, residual "
      f"{igp.cg_residual:.1e}")
print(f"dense-vs-lazy posterior match: mean {float(jnp.max(jnp.abs(mu_l - mu_d))):.2e}, "
      f"std {float(jnp.max(jnp.abs(std_l - std_d))):.2e}")

# ---- tier 3: matrix-free evidence gradients ---------------------------------
# one gradient step of (gamma, kappa, noise) — CG for the quadratic term,
# a single block of Hutchinson probes for the trace term
nll, grads = evidence_value_and_grad_lazy(
    x, y, gamma=0.6, kappa=1.0, noise=0.1, probes=64, cg_tol=1e-8,
    cg_maxiter=1000,
)
print(f"evidence: NLL/n = {float(nll)/n:.4f}")
print("gradients:", {k_: round(float(v_), 3) for k_, v_ in grads.items()})

# ---- tier 4: full matrix-free hyperparameter FIT ----------------------------
# log-space Adam over (gamma, noise) on the BBMM evidence — the n>8k
# counterpart of gp.optimize_params (which autodiffs a dense Cholesky)
from stpy_tpu.parallel import fit_evidence_lazy

fit = fit_evidence_lazy(
    x, y, gamma0=1.2, noise0=0.3, steps=30, lr=0.15, probes=64,
    cg_tol=1e-6, cg_maxiter=400, probe_tol=1e-2, probe_maxiter=60,
)
print(f"lazy hyperfit: gamma {fit['gamma']:.3f}  noise {fit['noise']:.3f}  "
      f"NLL/n {fit['nll']/n:.4f}  ({fit['steps_run']} steps)")
print("(on TPU, the same calls run at n = 16k / 65k — "
      "see docs/DESIGN.md §2-4 for the measured numbers)")
