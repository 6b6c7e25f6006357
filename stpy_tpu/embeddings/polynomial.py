"""Polynomial / Chebyshev / custom / one-hot embeddings.

Parity: stpy/embeddings/polynomial_embedding.py:44 (PolynomialEmbedding),
:89 (ChebyschevEmbedding), :161 (CustomEmbedding);
onehot_embedding.py:7 (OnehotEmbedding).
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.embeddings.base import Embedding


class PolynomialEmbedding(Embedding):
    """Tensor monomial features up to total degree p, with derivatives."""

    def __init__(self, d, p, groups=None, kappa=1.0, include_bias=True):
        self.d = int(d)
        self.p = int(p)
        self.kappa = kappa
        self.groups = groups
        self.include_bias = include_bias
        # all exponent multi-indices with total degree <= p
        degs = []
        for total in range(0 if include_bias else 1, p + 1):
            for combo in itertools.product(range(total + 1), repeat=d):
                if sum(combo) == total:
                    degs.append(combo)
        self.exponents = jnp.asarray(np.array(degs), jnp.int32)  # (m, d)
        self.m = self.exponents.shape[0]

    def embed(self, x):
        x = as_array(x).reshape(-1, self.d)
        # x^E via exp/log is unstable at 0 — use cumulative powers instead
        max_p = int(self.p)
        pows = [jnp.ones_like(x)]
        for _ in range(max_p):
            pows.append(pows[-1] * x)
        P = jnp.stack(pows, axis=0)  # (p+1, n, d)
        E = self.exponents  # (m, d)
        feats = jnp.ones((x.shape[0], self.m), x.dtype)
        for j in range(self.d):
            feats = feats * P[E[:, j], :, j].T
        return np.sqrt(self.kappa) * feats

    def derivative_1(self, x):
        """dΦ/dx via the power rule, (n, m, d)."""
        x = as_array(x).reshape(-1, self.d)
        base = self.embed(x) / np.sqrt(self.kappa)  # (n, m)
        out = []
        for k in range(self.d):
            ek = self.exponents[:, k].astype(x.dtype)
            xk = jnp.where(jnp.abs(x[:, k : k + 1]) < 1e-30, 1e-30, x[:, k : k + 1])
            out.append(base * ek[None, :] / xk)
        return np.sqrt(self.kappa) * jnp.stack(out, axis=2)

    def get_m(self):
        return self.m


class ChebyschevEmbedding(Embedding):
    """Chebyshev polynomials T_0..T_{p} per-dim tensorized
    (polynomial_embedding.py:89)."""

    def __init__(self, d, p, kappa=1.0):
        self.d = int(d)
        self.p = int(p)
        self.kappa = kappa
        self.m = (p + 1) ** d

    def _cheb_1d(self, t):
        # recurrence T_{k+1} = 2 t T_k - T_{k-1}
        Ts = [jnp.ones_like(t), t]
        for _ in range(2, self.p + 1):
            Ts.append(2 * t * Ts[-1] - Ts[-2])
        return jnp.stack(Ts[: self.p + 1], axis=1)  # (n, p+1)

    def embed(self, x):
        x = as_array(x).reshape(-1, self.d)
        n = x.shape[0]
        out = self._cheb_1d(x[:, 0])
        for k in range(1, self.d):
            nxt = self._cheb_1d(x[:, k])
            out = jnp.einsum("ni,nj->nij", out, nxt).reshape(n, -1)
        return np.sqrt(self.kappa) * out

    def get_m(self):
        return self.m


class CustomEmbedding(Embedding):
    """Wrap an arbitrary feature map fn(x)->(n,m); integral(S) by
    Gauss-Legendre quadrature (polynomial_embedding.py:161)."""

    def __init__(self, d, fn, m, quadrature_order=30, kappa=1.0):
        self.d = int(d)
        self.fn = fn
        self.m = int(m)
        self.kappa = kappa
        self.quadrature_order = quadrature_order

    def embed(self, x):
        return np.sqrt(self.kappa) * self.fn(as_array(x).reshape(-1, self.d))

    def integral(self, S):
        w, nodes = S.return_legendre_discretization(self.quadrature_order)
        return w @ self.embed(nodes)

    def get_m(self):
        return self.m


class OnehotEmbedding(Embedding):
    """Categorical one-hot features (onehot_embedding.py:7)."""

    def __init__(self, d, cats):
        self.d = int(d)
        self.cats = int(cats)
        self.m = self.d * self.cats

    def embed(self, x):
        x = jnp.asarray(x).astype(jnp.int32).reshape(-1, self.d)
        eye = jnp.eye(self.cats, dtype=default_dtype())
        return eye[x].reshape(x.shape[0], -1)

    def get_m(self):
        return self.m


class PackingEmbedding(Embedding):
    """SVD-packing basis: orthonormal basis of the span of kernel columns on
    a packing grid, with autodiff derivatives (parity:
    stpy/embeddings/packing_embedding.py:11)."""

    def __init__(self, d, m, kernel_object, interval=(-1, 1), grid=64):
        self.d = int(d)
        self.m = int(m)
        self.kernel_object = kernel_object
        from stpy_tpu.utils.helper import cartesian as _cart
        import numpy as _np

        per = max(int(round(grid ** (1.0 / d))), 2)
        xs = [_np.linspace(interval[0], interval[1], per) for _ in range(d)]
        self.grid = jnp.asarray(_cart(xs), default_dtype())
        K = kernel_object.gram(self.grid)
        w, V = jnp.linalg.eigh(K)
        w = jnp.clip(w[::-1][: self.m], 1e-12, None)
        V = V[:, ::-1][:, : self.m]
        self._M = V / jnp.sqrt(w)[None, :]

    def embed(self, x):
        from stpy_tpu.config import as_array as _as

        return self.kernel_object.cross(
            _as(x).reshape(-1, self.d), self.grid
        ) @ self._M

    def derivative_1(self, x):
        import jax as _jax

        f = lambda p: self.embed(p[None, :])[0]
        from stpy_tpu.config import as_array as _as

        return _jax.vmap(_jax.jacobian(f))(_as(x).reshape(-1, self.d))

    def get_m(self):
        return self.m
