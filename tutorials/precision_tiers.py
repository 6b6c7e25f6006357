"""Tutorial 5: f64-reference accuracy on f32-only hardware — precision tiers.

TPUs have no f64 ALUs. The torch reference (stpy) runs float64 end-to-end
(stpy/continuous_processes/gauss_procc.py:152); matching its posteriors on
a TPU takes compensated arithmetic, exposed as two knobs on
`GaussianProcess`:

  precision="single"   (default) true-f32 pipeline.
                       n=16k held-out vs host f64: mean 5.1e-6,
                       var max 6.9e-4. Fastest: 0.21 s fit+predict (v5e).
  precision="double"   the Gram is built as DOUBLE-FLOAT (hi, lo) pairs by
                       a Pallas kernel (error-free transforms on the VPU,
                       ~1.3e-10 per entry), the fit runs iterative-
                       refinement steps (`df_refine_steps`, default 1)
                       with an EXACT df residual GEMV, and the predictive
                       mean uses the same exact GEMV: mean ≤1e-7 at n=16k
                       for every df family (se 8.4e-8, matern32 7.2e-8,
                       se+matern52 7.7e-8). Covers SE/ARD, Matérn
                       ν ∈ {1/2, 3/2, 5/2}, laplace, and +/* algebra of
                       those atoms.
  var_refine=1         (with precision="double") replaces the predictive-
                       variance triangular solve with a fused df quadratic
                       form q = Σ W0 ⊙ (B + R) on an EXACT integer-sliced
                       (ozaki) main product: var max ≤1e-6 relative for
                       every df family (r4; benchmarks/RESULTS.md).

Kernels outside the fused df atoms (gibbs, polynomial, tanh, spectral,
custom maps, …) run precision="double" through the GENERIC df tier — a
jaxpr interpreter that re-executes the kernel's own trace in (hi, lo)
double-float (ops/df_interp.py); only data-dependent-control-flow
kernels (general-nu Bessel matern) raise.

On CPU under x64 (this script) the same code paths run against an exact
f64 fallback with identical semantics, so the demo executes anywhere:

    python tutorials/precision_tiers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess

# ---------------------------------------------------------------- data
rng = np.random.default_rng(0)
n, d, s = 512, 4, 0.1
x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
y = jnp.sin(3 * x[:, :1]) + s * jnp.asarray(rng.standard_normal((n, 1)))
xt = jnp.asarray(rng.uniform(-1, 1, (256, d)))

# a composite kernel — double mode covers +/* algebra of the df atoms
kernel = (
    KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
    + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=d)
)

# ------------------------------------------------- f64 host reference
K = np.asarray(kernel.eval_params(kernel.params_dict, x, x), np.float64)
L = np.linalg.cholesky(K + s * s * np.eye(n))
alpha = np.linalg.solve(L.T, np.linalg.solve(L, np.asarray(y, np.float64)))
Ks = np.asarray(kernel.eval_params(kernel.params_dict, xt, x), np.float64)
mu_ref = Ks @ alpha
V = np.linalg.solve(L, Ks.T)
var_ref = np.asarray(kernel.diag(xt, kernel.params_dict), np.float64) - (
    V * V
).sum(0)

# ------------------------------------------------------ the three tiers
for label, kwargs in [
    ("single", dict(precision="single")),
    ("double", dict(precision="double")),
    ("double + var_refine", dict(precision="double", var_refine=1)),
]:
    gp = GaussianProcess(kernel=kernel, s=s, **kwargs)
    gp.fit_gp(x, y)
    mu, sd = gp.mean_std(xt)
    mean_rel = float(
        np.max(np.abs(np.asarray(mu, np.float64).ravel() - mu_ref.ravel()))
        / np.max(np.abs(mu_ref))
    )
    var_rel = float(
        np.max(
            np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var_ref)
            / np.maximum(var_ref, 1e-12)
        )
    )
    print(f"{label:20s} mean rel {mean_rel:.2e}   var rel max {var_rel:.2e}")

# On this CPU/x64 demo the double tiers run the exact-f64 fallback, so the
# errors print at ~1e-15; the TPU numbers quoted in the module docstring
# are the measured on-device values (benchmarks/RESULTS.md has the ledger).
