"""stpy_tpu — a TPU-native stochastic-process framework (JAX/XLA/Pallas).

Re-design of the capabilities of `stpy` (Gaussian processes, finite-feature
GP approximations, Poisson/Cox point processes, multiple-kernel learning,
confidence-set machinery for Bayesian optimization) with a functional JAX
core, Pallas MXU kernels for Gram construction, on-device constrained
optimizers replacing cvxpy/MOSEK, and `jax.sharding` meshes for multi-chip
scale-out.
"""

__version__ = "0.1.0"

from stpy_tpu.config import default_dtype, default_jitter
from stpy_tpu.configs import GPConfig, KernelConfig, PoissonRateConfig
from stpy_tpu.domains import (
    BallSet,
    BorelSet,
    CandidateSet,
    HierarchicalBorelSets,
)
from stpy_tpu.kernels import KernelFunction

__all__ = [
    "BallSet",
    "BorelSet",
    "CandidateSet",
    "HierarchicalBorelSets",
    "KernelFunction",
    "default_dtype",
    "default_jitter",
]
