"""Bernstein-polynomial positive bases (+ spline variants).

Parity: stpy/embeddings/bernstein_embedding.py:8 (BernsteinEmbedding),
:128 (BernsteinSplinesOverlapping), :212 (BernsteinSplinesEmbedding).

Rewrite notes: the reference evaluates each basis polynomial through
scipy.interpolate.BPoly one index at a time and integrates numerically per
index. Here the whole (n, m) Bernstein design matrix is one broadcast
expression (binomial-coefficient table precomputed), and integrals use
Gauss-Legendre rules of sufficient order — EXACT for polynomials — evaluated
for all basis indices simultaneously.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.embeddings.positive import PositiveEmbedding


def _binom_table(n: int) -> np.ndarray:
    from math import comb

    return np.array([comb(n, k) for k in range(n + 1)], dtype=float)


class BernsteinEmbedding(PositiveEmbedding):
    """Degree-(m-1) Bernstein basis on the interval."""

    def _bernstein_1d(self, x1d: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.interval
        t = (x1d - lo) / (hi - lo)
        inside = (t >= 0.0) & (t <= 1.0)
        tc = jnp.clip(t, 0.0, 1.0)[:, None]
        n = self.m - 1
        ks = jnp.arange(self.m, dtype=default_dtype())
        C = jnp.asarray(_binom_table(n), default_dtype())
        # guard 0^0 at the endpoints
        logt = jnp.log(jnp.maximum(tc, 1e-300))
        log1mt = jnp.log(jnp.maximum(1.0 - tc, 1e-300))
        B = C * jnp.exp(ks * logt + (n - ks) * log1mt)
        B = jnp.where(tc == 0.0, jnp.where(ks == 0, 1.0, 0.0), B)
        B = jnp.where(tc == 1.0, jnp.where(ks == n, 1.0, 0.0), B)
        return jnp.where(inside[:, None], B, 0.0)

    def _basis_matrix_1d(self, x1d):
        return self._bernstein_1d(x1d)

    def basis_fun(self, x, j):
        x = as_array(x).reshape(-1)
        return self._bernstein_1d(x)[:, j].reshape(-1, 1)

    def _gl_integral_1d(self, a, b) -> jnp.ndarray:
        """Exact ∫_a^b B_j for all j: GL rule of order m (clipped to the
        support interval)."""
        lo, hi = self.interval
        a, b = max(float(a), lo), min(float(b), hi)
        if b <= a:
            return jnp.zeros(self.m, default_dtype())
        nodes, weights = np.polynomial.legendre.leggauss(self.m)
        xs = jnp.asarray(
            nodes * (b - a) / 2 + (a + b) / 2, default_dtype()
        )
        ws = jnp.asarray(weights * (b - a) / 2, default_dtype())
        return ws @ self._bernstein_1d(xs)

    def integral(self, S):
        key = id(S)
        if key in self.procomp_integrals:
            return self.procomp_integrals[key]
        assert S.d == self.d
        # tensor-product box integral for ANY d (kron order of
        # embed_internal); parity: positive_embedding.py:101-113 (d ≤ 3).
        psi = self._gl_integral_1d(S.bounds[0, 0], S.bounds[0, 1])
        for k in range(1, self.d):
            vk = self._gl_integral_1d(S.bounds[k, 0], S.bounds[k, 1])
            psi = (psi[:, None] * vk[None, :]).reshape(-1)
        emb = psi @ self.cov()
        self.procomp_integrals[key] = emb
        return emb

    def product_integral(self, S):
        """Ψ_ij = ∫_S B_i B_j — exact GL of order m (degree 2m-2)."""
        assert self.d == 1
        lo, hi = self.interval
        a = max(float(S.bounds[0, 0]), lo)
        b = min(float(S.bounds[0, 1]), hi)
        nodes, weights = np.polynomial.legendre.leggauss(self.m + 1)
        xs = jnp.asarray(nodes * (b - a) / 2 + (a + b) / 2, default_dtype())
        ws = jnp.asarray(weights * (b - a) / 2, default_dtype())
        B = self._bernstein_1d(xs)  # (q, m)
        Psi = (B * ws[:, None]).T @ B
        G = self.cov()
        return G.T @ Psi @ G


class _SplineMixin:
    """Piecewise-Bernstein splines: m = segments x degree local functions."""

    def _seg_params(self):
        deg = self.degree
        n_seg = self.m // deg
        dm = (self.interval[1] - self.interval[0]) / n_seg
        return deg, n_seg, dm

    def _spline_matrix_1d(self, x1d: jnp.ndarray) -> jnp.ndarray:
        deg, n_seg, dm = self._seg_params()
        lo = self.interval[0]
        cols = []
        C = jnp.asarray(_binom_table(deg - 1), default_dtype())
        n = deg - 1
        ks = jnp.arange(deg, dtype=default_dtype())
        for j in range(n_seg):
            tj = lo + j * dm
            t = (x1d - tj) / dm
            inside = (t >= 0.0) & (t < 1.0)
            tc = jnp.clip(t, 0.0, 1.0)[:, None]
            logt = jnp.log(jnp.maximum(tc, 1e-300))
            log1mt = jnp.log(jnp.maximum(1.0 - tc, 1e-300))
            B = C * jnp.exp(ks * logt + (n - ks) * log1mt)
            B = jnp.where(tc == 0.0, jnp.where(ks == 0, 1.0, 0.0), B)
            cols.append(jnp.where(inside[:, None], B, 0.0))
        return jnp.concatenate(cols, axis=1)

    def _basis_matrix_1d(self, x1d):
        return self._spline_matrix_1d(x1d)

    def basis_fun(self, x, q):
        x = as_array(x).reshape(-1)
        return self._spline_matrix_1d(x)[:, q].reshape(-1, 1)

    def integral(self, S):
        assert self.d == 1
        deg, n_seg, dm = self._seg_params()
        a, b = float(S.bounds[0, 0]), float(S.bounds[0, 1])
        lo = self.interval[0]
        nodes, weights = np.polynomial.legendre.leggauss(deg + 1)
        out = []
        for j in range(n_seg):
            sa, sb = max(a, lo + j * dm), min(b, lo + (j + 1) * dm)
            if sb <= sa:
                out.append(jnp.zeros(deg, default_dtype()))
                continue
            xs = jnp.asarray(nodes * (sb - sa) / 2 + (sa + sb) / 2,
                             default_dtype())
            ws = jnp.asarray(weights * (sb - sa) / 2, default_dtype())
            seg = self._spline_matrix_1d(xs)[:, j * deg : (j + 1) * deg]
            out.append(ws @ seg)
        psi = jnp.concatenate(out)
        return psi @ self.cov()


class BernsteinSplinesEmbedding(_SplineMixin, PositiveEmbedding):
    """Non-overlapping piecewise-Bernstein splines
    (bernstein_embedding.py:212)."""

    def __init__(self, *args, degree=4, **kwargs):
        super().__init__(*args, **kwargs)
        self.degree = degree
        assert self.m % degree == 0, "m must be divisible by degree"


class BernsteinSplinesOverlapping(_SplineMixin, PositiveEmbedding):
    """Overlapping spline segments (half-degree pieces on a staggered grid,
    bernstein_embedding.py:128)."""

    def __init__(self, *args, degree=4, **kwargs):
        super().__init__(*args, **kwargs)
        self.degree = degree // 2
        assert self.m % self.degree == 0
