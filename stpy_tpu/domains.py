"""Borel sets (domains) with quadrature discretizations — TPU-native rewrite.

Reference parity: stpy/borel_set.py:9 (BorelSet), :94 (BallSet), :193 (Node),
:208 (HierarchicalBorelSets); stpy/candidate_set.py:5 (CandidateSet).

Design: set geometry and quadrature node/weight construction are host-side
(numpy) — they happen once at design time — but every array handed back is a
`jnp` array with static shape so it can flow straight into jit'd likelihoods.
`is_inside` is a vectorized mask usable under jit/vmap (the reference loops
per-dimension in Python).
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.utils.helper import cartesian


class BorelSet:
    """Axis-aligned box  prod_i [a_i, b_i)  in R^d."""

    type = "box"

    def __init__(self, d: int, bounds):
        self.d = d
        self.bounds = jnp.asarray(bounds, dtype=default_dtype()).reshape(d, 2)
        self._bounds_np = np.asarray(self.bounds)
        self.vol = float(np.prod(self._bounds_np[:, 1] - self._bounds_np[:, 0]))

    # -- geometry ----------------------------------------------------------
    def description(self):
        return self.bounds

    def volume(self) -> float:
        return self.vol

    def center_point(self) -> jnp.ndarray:
        return (self.bounds[:, 1] + self.bounds[:, 0]) / 2.0

    def perimeter(self) -> float:
        return float(2.0 * np.sum(self._bounds_np[:, 1] - self._bounds_np[:, 0]))

    def inside(self, other: "BorelSet") -> bool:
        """True if `other` (a box) is contained in this box."""
        ob = np.asarray(other.bounds)
        return bool(
            np.all(self._bounds_np[:, 0] <= ob[:, 0])
            and np.all(self._bounds_np[:, 1] >= ob[:, 1])
        )

    def is_inside(self, x: jnp.ndarray) -> jnp.ndarray:
        """Vectorized membership mask for x of shape (n, d); jit/vmap safe."""
        lo = self.bounds[:, 0]
        hi = self.bounds[:, 1]
        return jnp.all((x >= lo) & (x < hi), axis=-1)

    # -- sampling / discretization ------------------------------------------
    def uniform_sample(self, key, n: int) -> jnp.ndarray:
        """n uniform points; `key` is a jax PRNG key (explicit, TPU-native)."""
        u = jax.random.uniform(key, (n, self.d), dtype=default_dtype())
        return self.bounds[:, 0] + u * (self.bounds[:, 1] - self.bounds[:, 0])

    def return_discretization(self, n: int, offsets=None) -> jnp.ndarray:
        """Tensor grid with n points per dimension, shape (n**d, d)."""
        xs = []
        for i in range(self.d):
            a, b = self._bounds_np[i]
            if offsets is not None:
                a, b = a - offsets[i], b + offsets[i]
            xs.append(np.linspace(a, b, n))
        return jnp.asarray(cartesian(xs), dtype=default_dtype())

    def return_legendre_discretization(self, n: int):
        """Tensor-product Gauss-Legendre rule: (weights (n**d,), nodes (n**d, d)).

        sum_i w_i f(x_i) ≈ ∫_S f.  (Fixes the cumulative-rescale bug in the
        reference, stpy/borel_set.py:44-56, by scaling nodes per-dimension.)
        """
        nodes0, weights0 = np.polynomial.legendre.leggauss(n)
        nodes_arr, weights_arr = [], []
        for i in range(self.d):
            a, b = self._bounds_np[i]
            nodes_arr.append(nodes0 * (b - a) / 2.0 + (a + b) / 2.0)
            weights_arr.append(weights0 * 0.5 * (b - a))
        nodes = cartesian(nodes_arr)
        weights = np.prod(cartesian(weights_arr), axis=1)
        return (
            jnp.asarray(weights, dtype=default_dtype()),
            jnp.asarray(nodes, dtype=default_dtype()),
        )


class BallSet(BorelSet):
    """Euclidean ball; quadrature supported for d in {1, 2}."""

    type = "round"

    def __init__(self, d: int, center, radius: float):
        self.d = d
        self.center = jnp.asarray(center, dtype=default_dtype()).reshape(d)
        self.radius = float(radius)
        self.vol = (self.radius**d) * math.pi ** (d / 2.0) / math.gamma(d / 2.0 + 1)
        lo = np.asarray(self.center) - self.radius
        hi = np.asarray(self.center) + self.radius
        # bounding box, used for grid discretizations
        self.bounds = jnp.asarray(np.stack([lo, hi], axis=1), dtype=default_dtype())
        self._bounds_np = np.asarray(self.bounds)

    def description(self):
        return self.center, self.radius

    def inside(self, other) -> bool:
        if other.type == "box":
            ob = np.asarray(other.bounds)
            c = np.asarray(self.center)
            # farthest corner of the box from the center must be within radius
            corner = np.maximum(np.abs(ob[:, 0] - c), np.abs(ob[:, 1] - c))
            return bool(np.sum(corner**2) <= self.radius**2)
        else:
            dist = np.linalg.norm(np.asarray(self.center) - np.asarray(other.center))
            return bool(dist + other.radius <= self.radius)

    def is_inside(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum((x - self.center) ** 2, axis=-1) <= self.radius**2

    def uniform_sample(self, key, n: int) -> jnp.ndarray:
        """Rejection-free: direction ~ normal, radius ~ U^(1/d) * R."""
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (n, self.d), dtype=default_dtype())
        z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
        r = self.radius * jax.random.uniform(k2, (n, 1), dtype=default_dtype()) ** (
            1.0 / self.d
        )
        return self.center + z * r

    def return_legendre_discretization(self, n: int):
        """Quadrature over the ball.

        d=1: Gauss-Legendre on the interval. d=2: Gauss-Chebyshev (angular) x
        Gauss-Legendre (chord) disc rule (same family as stpy/borel_set.py:147-160).
        """
        if self.d == 1:
            return super().return_legendre_discretization(n)
        if self.d != 2:
            raise NotImplementedError("BallSet quadrature only for d<=2")
        p, w = np.polynomial.legendre.leggauss(n)
        mu = np.arange(1, n + 1)
        sin_mu = np.sin(mu * np.pi / (n + 1))
        cos_mu = np.cos(mu * np.pi / (n + 1))
        xs = np.tile(self.radius * cos_mu, n)
        ys = np.outer(p, self.radius * sin_mu).flatten()
        points = np.stack([xs, ys], axis=1) + np.asarray(self.center)
        weights = np.outer(w, sin_mu**2).flatten() * (
            np.pi * self.radius**2 / (n + 1)
        )
        return (
            jnp.asarray(weights, dtype=default_dtype()),
            jnp.asarray(points, dtype=default_dtype()),
        )

    def return_discretization(self, n: int, offsets=None) -> jnp.ndarray:
        if self.d == 1:
            return super().return_discretization(n)
        _, pts = self.return_legendre_discretization(n)
        return pts


class Node(BorelSet):
    """BorelSet that participates in a hierarchy (binary in 1d, quad in 2d)."""

    def __init__(self, d, bounds, parent):
        super().__init__(d, bounds)
        self.left = None
        self.right = None
        self.children = None
        self.parent = parent
        self.level = 1 if parent is None else parent.level + 1


class HierarchicalBorelSets:
    """Dyadic hierarchy of boxes over an interval (1d) or rectangle (2d).

    Used by the sensing / point-process stack to bucket observations onto leaf
    sets. Reference: stpy/borel_set.py:208-290.
    """

    def __init__(self, d: int, interval, levels: int):
        bounds = np.asarray(interval, dtype=float).reshape(d, 2)
        self.top_node = Node(d, bounds, None)
        self.Sets = [self.top_node]
        self.levels = levels
        self.d = d
        self._construct(bounds, levels, self.top_node)

    def get_parent_set(self) -> Node:
        return self.top_node

    def get_sets_level(self, l: int) -> list[Node]:
        return [s for s in self.Sets if s.level == l]

    def get_all_sets(self) -> list[Node]:
        return self.Sets

    def get_leafs(self) -> list[Node]:
        return self.get_sets_level(self.levels)

    def get_ball_coverings(self, n: int, radius="auto") -> list[BallSet]:
        D = self.get_parent_set()
        centers = np.asarray(D.return_discretization(n))
        m = centers.shape[0]
        r = 2.0 / m if radius == "auto" else radius
        return [BallSet(D.d, centers[i], r) for i in range(m)]

    def _construct(self, bounds, levels, parent):
        """2^d-ary dyadic split to `levels` (binary in 1d, quad in 2d,
        octree in 3d, …). Child order = binary masks in lexicographic order,
        which reproduces the reference's 1-D left/right and 2-D quadrant
        orders (stpy/borel_set.py:208-290; the reference stops at d=2)."""
        if levels <= 1:
            return
        bounds = np.asarray(bounds, dtype=float)
        mids = bounds.mean(axis=1)
        children = []
        for mask in itertools.product((0, 1), repeat=self.d):
            nb = np.stack(
                [
                    np.where(np.asarray(mask) == 0, bounds[:, 0], mids),
                    np.where(np.asarray(mask) == 0, mids, bounds[:, 1]),
                ],
                axis=1,
            )
            children.append(Node(self.d, nb, parent))
        parent.children = children
        if self.d == 1:
            parent.left, parent.right = children
        for child in children:
            self.Sets.append(child)
            self._construct(np.asarray(child.bounds), levels - 1, child)


class CandidateSet:
    """Discrete candidate set for BO (stpy/candidate_set.py:5)."""

    def __init__(self, points):
        self.points = jnp.asarray(points, dtype=default_dtype())
        self.n, self.d = self.points.shape

    def get_points(self) -> jnp.ndarray:
        return self.points

    def size(self) -> int:
        return self.n


class CandidateDiscreteSet(CandidateSet):
    """Discrete candidate set with removal/selection bookkeeping (parity:
    stpy/candidate_set.py)."""

    def __init__(self, points):
        super().__init__(points)
        self._active = np.ones(self.n, dtype=bool)

    def get_options_per_dim(self):
        return [np.unique(np.asarray(self.points)[:, j])
                for j in range(self.d)]

    def remove(self, idx):
        self._active[np.asarray(idx)] = False

    def get_active_points(self):
        return self.points[jnp.asarray(np.where(self._active)[0])]
