"""Regularizers over the probability simplex (MKL weight priors).

Parity: stpy/regularization/simplex_regularizer.py:5-84
(ProbabilityRegularizer, Sup, Dirichlet, WeightedAitchison, L1Measure).
Each supplies a smooth `eval` usable in the exponentiated-gradient MKL
solver (cvxpy branch-enumeration in the reference becomes a smooth penalty;
the Sup regularizer's per-vertex branches are handled by its smooth
1/max surrogate).
"""

from __future__ import annotations

import jax.numpy as jnp

from stpy_tpu.regularization.regularizer import Regularizer


class ProbabilityRegularizer(Regularizer):
    def __init__(self, lam=1.0, w=None, d=1, **kwargs):
        super().__init__(lam)
        self.w = w if w is not None else jnp.ones(d) / d
        self.d = d
        self.dcp = True
        self.name = "default"

    def eval(self, theta):
        return jnp.zeros(())


class SupRegularizer(ProbabilityRegularizer):
    """λ / max_i(w_i θ_i): favors concentrated weights
    (simplex_regularizer.py:18)."""

    def __init__(self, constrained=False, version="1", **kwargs):
        super().__init__(**kwargs)
        self.convex = False
        self.name = "sup"
        self.constrained = constrained
        self.version = version

    def eval(self, theta):
        # smooth max via logsumexp for a usable gradient
        t = 50.0
        smax = jnp.log(jnp.sum(jnp.exp(t * self.w * theta))) / t
        return self.lam / jnp.maximum(smax, 1e-10)


class DirichletRegularizer(ProbabilityRegularizer):
    """-(w-1)ᵀ log θ Dirichlet prior (simplex_regularizer.py:49)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.name = "dirichlet"

    def eval(self, theta):
        return -self.lam * jnp.sum(
            (self.w - 1.0) * jnp.log(jnp.clip(theta, 1e-12))
        )


class WeightedAitchisonRegularizer(ProbabilityRegularizer):
    """2λ Σ log(θ)² Aitchison-geometry prior (simplex_regularizer.py:62)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.dcp = False
        self.name = "aitchison"

    def eval(self, theta):
        return 2.0 * self.lam * jnp.sum(
            jnp.log(jnp.clip(theta, 1e-12)) ** 2
        )


class L1MeasureRegularizer(ProbabilityRegularizer):
    """λ ||θ||₁ (simplex_regularizer.py:79)."""

    def eval(self, theta):
        return self.lam * jnp.sum(jnp.abs(theta))
