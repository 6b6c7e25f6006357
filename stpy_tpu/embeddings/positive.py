"""Pointwise-positive bases: embeddings whose coefficients can be box-
constrained to yield provably nonnegative rate functions l ≤ Λθ ≤ u.

Parity: stpy/embeddings/positive_embedding.py:12 (PositiveEmbedding base:
RKHS re-weighting Γ^{1/2}, Kronecker tensorization to d=2,3, constrained
fit) and stpy/embeddings/bump_bases.py (TriangleEmbedding :12,
FaberSchauderEmbedding :146, KuhnExponentialEmbedding :209, CustomHaarBumps
:230, BumpsEmbedding :261).

TPU-first changes:
  * basis evaluation is a vectorized (n, m) matrix op (the reference loops
    per basis index and per-row np.kron; here tensorization is one einsum);
  * Γ^{1/2} via eigh-based symmetric sqrt on device (replaces scipy.sqrtm);
  * the constrained LSQ `fit` (reference: cvxpy+MOSEK,
    positive_embedding.py:115-146) becomes box-FISTA in the θ = Γ^{1/2}ξ
    variable, where the positivity constraint is an exact clip.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.domains import BorelSet
from stpy_tpu.embeddings.base import Embedding
from stpy_tpu.linalg import symsqrt  # noqa: F401 (re-export for subclasses)
from stpy_tpu.opt.prox import fista_backtracking


def _np_symsqrt(A, eps=1e-12):
    """Host float64 symmetric sqrt (setup-time; see cov())."""
    w, V = np.linalg.eigh(A)
    w = np.clip(w, eps, None)
    return (V * np.sqrt(w)) @ V.T


class PositiveEmbedding(Embedding):
    def __init__(self, d, m, kernel_object=None, interval=(-1, 1), B=1000.0,
                 b=0.0, s=0.001, offset=0.0):
        self.d = int(d)
        self.m = int(m)
        self.b = b
        self.B = B
        self.s = s
        self.offset = offset
        self.interval = (interval[0] - offset, interval[1] + offset)
        self.kernel_object = kernel_object
        self.borel_set = BorelSet(
            1, np.array([[self.interval[0], self.interval[1]]])
        )
        self.mu = None
        self.precomp = False
        self.procomp_integrals = {}

    # -- basis ----------------------------------------------------------------
    def basis_fun(self, x, j):
        """φ_j over 1-D inputs; subclasses implement."""
        raise NotImplementedError

    def _basis_matrix_1d(self, x1d: jnp.ndarray) -> jnp.ndarray:
        """(n, m) matrix of all 1-D basis functions; default stacks
        basis_fun, subclasses override with a fully vectorized form."""
        cols = [
            self.basis_fun(x1d.reshape(-1, 1), j).reshape(-1)
            for j in range(self.m)
        ]
        return jnp.stack(cols, axis=1)

    def embed_internal(self, x) -> jnp.ndarray:
        """Tensor-product basis over d dims via batched Kronecker (einsum) —
        parity with positive_embedding.py:85-113 (index j = j_1·m + j_2)."""
        x = as_array(x).reshape(-1, self.d)
        n = x.shape[0]
        out = self._basis_matrix_1d(x[:, 0])
        for k in range(1, self.d):
            nxt = self._basis_matrix_1d(x[:, k])
            out = jnp.einsum("ni,nj->nij", out, nxt).reshape(n, -1)
        return out

    def get_m(self) -> int:
        return self.m**self.d

    def get_size(self):
        return self.get_m()

    def get_constraints(self):
        s = self.get_m()
        l = jnp.full((s,), float(self.b), default_dtype())
        u = jnp.full((s,), float(self.B), default_dtype())
        Lambda = jnp.eye(s, dtype=default_dtype())
        return (l, Lambda, u)

    # -- RKHS re-weighting (positive_embedding.py:54-83) -----------------------
    def _grid_nodes(self) -> jnp.ndarray:
        dm = (self.interval[1] - self.interval[0]) / (self.m - 1)
        t = self.interval[0] + np.arange(self.m) * dm
        from stpy_tpu.utils.helper import cartesian

        return jnp.asarray(
            cartesian([t] * self.d), default_dtype()
        )

    def cov(self, inverse=False):
        if not self.precomp:
            if self.kernel_object is not None:
                # one-time HOST precompute in float64. The pinv/symsqrt
                # chain runs on a grid Gram with cond ~1e12; in f32 it
                # corrupts Γ^{1/2} enough to shift Poisson MAP totals by
                # >10% (isolated on BASELINE config 4: f32 cov 4.06 vs
                # f64 4.63 on identical data; with these host-f64
                # decompositions f32 reproduces f64 exactly). Inputs may be
                # f32-rounded — only the DECOMPOSITIONS need f64. Grid is
                # m^d (small), so this is setup cost, not a hot path.
                t = self._grid_nodes()
                Gamma = np.asarray(
                    self.kernel_object.gram(t), np.float64
                )
                Z = np.asarray(self.embed_internal(t), np.float64)
                n = Gamma.shape[0]
                M = np.linalg.pinv(Z.T @ Z + self.s * np.eye(n))
                Gh = _np_symsqrt(M) @ _np_symsqrt(
                    Gamma + 1e-5 * self.s**2 * np.eye(n)
                )
                dt = default_dtype()
                self.Gamma_half = jnp.asarray(Gh, dt)
                self.invGamma_half = jnp.asarray(np.linalg.pinv(Gh), dt)
            else:
                self.Gamma_half = jnp.eye(self.get_m(), dtype=default_dtype())
                self.invGamma_half = self.Gamma_half
            self.precomp = True
        if inverse:
            return self.Gamma_half, self.invGamma_half
        return self.Gamma_half

    def embed(self, x) -> jnp.ndarray:
        return self.embed_internal(x) @ self.cov()

    # -- constrained fit (replaces MOSEK; positive_embedding.py:115-146) -------
    def fit(self, x, y, already_embedded=False):
        """min_ξ s²·||ξ|| + ||Φξ - y||² s.t. b ≤ Γ^{1/2}ξ ≤ B, solved in the
        θ = Γ^{1/2}ξ variable where the constraint is a box (prox = clip)."""
        G_half, invG_half = self.cov(inverse=True)
        Phi_raw = (
            as_array(x) @ invG_half if already_embedded else
            self.embed_internal(x)
        )
        yv = as_array(y).reshape(-1)
        l, _, u = self.get_constraints()

        def obj(theta):
            r = Phi_raw @ theta - yv
            xi = invG_half @ theta
            return jnp.sum(r * r) + self.s**2 * jnp.sqrt(
                jnp.sum(xi * xi) + 1e-12
            )

        theta0 = jnp.clip(jnp.zeros(self.get_m(), yv.dtype), l, u)
        res = fista_backtracking(
            obj, theta0, lambda t: jnp.clip(t, l, u), max_iter=1000
        )
        xi = invG_half @ res.x
        self.mode = xi[:, None]
        self.mu = self.mode
        return np.asarray(xi)

    def mean(self, xtest):
        return self.embed(xtest) @ self.mu

    def mean_std(self, xtest):
        return self.mean(xtest), None

    def sample_theta(self, key=None):
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        self.mu = jax.random.normal(key, (self.get_m(), 1), default_dtype())
        return self.mu

    def sample(self, xtest, size=1, key=None):
        return self.embed(xtest) @ self.sample_theta(key)

    # generic integral via quadrature (overridden with closed forms below)
    def integral(self, S):
        key = id(S)
        if key in self.procomp_integrals:
            return self.procomp_integrals[key]
        w, nodes = S.return_legendre_discretization(30)
        vals = self.embed_internal(nodes)
        psi = w @ vals
        emb = psi @ self.cov()
        self.procomp_integrals[key] = emb
        return emb


def _hat_integral_cdf(z):
    """G(z) = ∫_{-∞}^z max(1-|t|, 0) dt — closed-form CDF of the unit hat."""
    z = jnp.clip(z, -1.0, 1.0)
    return jnp.where(
        z <= 0.0, 0.5 * (z + 1.0) ** 2, 1.0 - 0.5 * (1.0 - z) ** 2
    )


class TriangleEmbedding(PositiveEmbedding):
    """Hat functions on a uniform grid, exact piecewise box integrals.
    Parity: bump_bases.py:12-127 (the eight-case integrate_1d collapses into
    one hat-CDF difference, vectorized over all nodes)."""

    def _nodes_dm(self):
        dm = (self.interval[1] - self.interval[0]) / (self.m - 1)
        t = self.interval[0] + jnp.arange(self.m, dtype=default_dtype()) * dm
        return t, dm

    def basis_fun(self, x, j):
        t, dm = self._nodes_dm()
        x = as_array(x)
        return jnp.maximum(1.0 - jnp.abs((x - t[j]) / dm), 0.0)

    def _basis_matrix_1d(self, x1d):
        t, dm = self._nodes_dm()
        return jnp.maximum(
            1.0 - jnp.abs((x1d[:, None] - t[None, :]) / dm), 0.0
        )

    def integral_1d_all(self, a, b):
        """∫_a^b hat_j for ALL m nodes at once: dm·(G((b-t)/dm)-G((a-t)/dm))."""
        t, dm = self._nodes_dm()
        return dm * (
            _hat_integral_cdf((b - t) / dm) - _hat_integral_cdf((a - t) / dm)
        )

    def integral(self, S):
        key = id(S)
        if key in self.procomp_integrals:
            return self.procomp_integrals[key]
        assert S.d == self.d
        if S.type == "box":
            # tensor-product box integral for ANY d: successive outer
            # products in the kron order of embed_internal (index
            # j = j_1·m^{d-1} + … + j_d). Parity: positive_embedding.py:
            # 101-113 supports d ≤ 3 via explicit np.kron; this is the
            # general closed form.
            psi = self.integral_1d_all(S.bounds[0, 0], S.bounds[0, 1])
            for k in range(1, self.d):
                vk = self.integral_1d_all(S.bounds[k, 0], S.bounds[k, 1])
                psi = (psi[:, None] * vk[None, :]).reshape(-1)
        else:
            w, nodes = S.return_legendre_discretization(30)
            psi = w @ self.embed_internal(nodes)
        emb = psi @ self.cov()
        self.procomp_integrals[key] = emb
        return emb

    def product_integral(self, S):
        """Ψ_ij = ∫_S φ_i φ_j over the full domain box: tridiagonal closed
        form (overlapping hats), tensorized across dims."""
        t, dm = self._nodes_dm()
        main = jnp.full((self.m,), 2.0 * dm / 3.0)
        main = main.at[0].set(dm / 3.0).at[-1].set(dm / 3.0)
        off = jnp.full((self.m - 1,), dm / 6.0)
        Psi1 = jnp.diag(main) + jnp.diag(off, 1) + jnp.diag(off, -1)
        Psi = Psi1
        for _ in range(1, self.d):
            Psi = jnp.kron(Psi, Psi1)
        G = self.cov()
        return G.T @ Psi @ G


class FaberSchauderEmbedding(TriangleEmbedding):
    """Hierarchical (dyadic) hat basis. Parity: bump_bases.py:146-206."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if 2 ** int(np.log2(self.m)) != self.m:
            raise AssertionError("This basis works only with log_2(n) is integer.")

    def _node_table(self):
        """(centers, widths) for each of the m hierarchical hats; index 0 is
        the constant function (width = inf marker)."""
        c = np.zeros(self.m)
        w = np.zeros(self.m)
        span = self.interval[1] - self.interval[0]
        c[0], w[0] = 0.0, np.inf
        if self.m > 1:
            c[1], w[1] = 0.0, span / 2
        j = 2
        while j < self.m:
            level = int(np.floor(np.log2(j)))
            start = 2**level
            dm = span / (2 * start)
            c[j] = self.interval[0] + (j - start) * 2 * dm + dm
            w[j] = dm
            j += 1
        return c, w

    def basis_fun(self, x, j):
        x = as_array(x)
        c, w = self._node_table()
        if j == 0:
            return jnp.ones_like(x)
        return jnp.maximum(1.0 - jnp.abs((x - c[j]) / w[j]), 0.0)

    def _basis_matrix_1d(self, x1d):
        c, w = self._node_table()
        c_j = jnp.asarray(c, default_dtype())
        w_j = jnp.asarray(np.where(np.isinf(w), 1.0, w), default_dtype())
        hats = jnp.maximum(
            1.0 - jnp.abs((x1d[:, None] - c_j[None, :]) / w_j[None, :]), 0.0
        )
        return hats.at[:, 0].set(1.0)

    def integral(self, S):
        assert self.d == 1
        a, b = S.bounds[0, 0], S.bounds[0, 1]
        c, w = self._node_table()
        vals = [b - a]
        for j in range(1, self.m):
            vals.append(
                w[j]
                * (
                    _hat_integral_cdf((b - c[j]) / w[j])
                    - _hat_integral_cdf((a - c[j]) / w[j])
                )
            )
        psi = jnp.stack([jnp.asarray(v, default_dtype()) for v in vals])
        return psi @ self.cov()

    def hierarchical_mask(self):
        mask = [0]
        for i in range(int(np.log2(self.m))):
            mask.extend([i + 1] * (2**i))
        return jnp.asarray(mask, default_dtype())


class KuhnExponentialEmbedding(PositiveEmbedding):
    """Gaussian-RKHS covering basis of Kühn. Parity: bump_bases.py:209."""

    def __init__(self, *args, gamma=0.1, **kwargs):
        super().__init__(*args, **kwargs)
        self.gamma = gamma

    def basis_fun(self, x, j):
        from scipy.special import gammaln

        x = as_array(x)
        k = np.exp(
            j / 2 * np.log(1.0 / self.gamma) - (j / 2) * gammaln(j + 1)
        )
        res = k * (x**j) * jnp.exp(-(x**2) / (2 * self.gamma**2))
        return jnp.where((x < 0) | (x > 1), 0.0, res)


class BumpsEmbedding(PositiveEmbedding):
    """Parabolic bumps on a grid. Parity: bump_bases.py:261."""

    def basis_fun(self, x, j):
        x = as_array(x)
        dm = (self.interval[1] - self.interval[0]) / (self.m - 1)
        tj = self.interval[0] + j * dm
        res = -(x - tj) * (x - (tj + 2 * dm)) / dm**2
        return jnp.maximum(res, 0.0)


class CustomHaarBumps(PositiveEmbedding):
    """Weighted indicator bumps at custom nodes/widths.
    Parity: bump_bases.py:230."""

    def __init__(self, d, m, nodes, widths, weights, **kwargs):
        super().__init__(d, m, **kwargs)
        self.nodes = as_array(nodes)
        self.widths = as_array(widths)
        self.weights_j = as_array(weights)

    def basis_fun(self, x, j):
        x = as_array(x)
        mask = jnp.abs(x - self.nodes[j]) < self.widths[j]
        return jnp.where(mask, self.weights_j[j], 0.0)
