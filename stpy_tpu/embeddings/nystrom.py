"""Nyström feature maps: data-dependent finite bases from Gram
eigenstructure, with uniform / leverage-score / online-leverage subsampling,
plus the positive (NMF-based) variant used by positive-basis rate estimators.

Parity: stpy/continuous_processes/nystrom_fea.py:11 (NystromFeatures with
approx in {uniform, leverage, online_leverage, svd, nothing, positive_svd,
cover}) and stpy/embeddings/bump_bases.py:300 (PositiveNystromEmbeddingBump).

TPU notes: eigh/symsqrt run on device; leverage scores come from one batched
GP posterior-variance computation instead of the reference's per-point
sequential refit loop (nystrom_fea.py:78-104 — O(N) Cholesky refits); NMF
for the positive basis is a jitted multiplicative-update loop (replaces
sklearn.decomposition.NMF).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.embeddings.base import Embedding
from stpy_tpu.embeddings.positive import PositiveEmbedding
from stpy_tpu.linalg import safe_cholesky, cho_solve, symsqrt


def nmf_multiplicative(X, r, iters=2000, key=None, eps=1e-12):
    """Nonnegative matrix factorization X ≈ W H by multiplicative updates
    (Lee–Seung), jitted lax.fori_loop. X: (n, s) nonneg."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n, s = X.shape
    k1, k2 = jax.random.split(key)
    W0 = jax.random.uniform(k1, (n, r), X.dtype) + 0.1
    H0 = jax.random.uniform(k2, (r, s), X.dtype) + 0.1

    @jax.jit
    def run(X, W, H):
        def body(_, WH):
            W, H = WH
            H = H * (W.T @ X) / (W.T @ W @ H + eps)
            W = W * (X @ H.T) / (W @ (H @ H.T) + eps)
            return W, H

        return jax.lax.fori_loop(0, iters, body, (W, H))

    return run(X, W0, H0)


class NystromFeatures(Embedding):
    def __init__(self, kernel_object, m=100, approx="uniform", s=1.0,
                 samples=100, key=None):
        self.fitted = False
        self.m = int(m)
        self.ms = int(m)
        self.samples = samples
        self.kernel_object = kernel_object
        self.approx = approx
        self.s = s
        self.key = key if key is not None else jax.random.PRNGKey(17)

    def description(self):
        return "Nystrom\nApprox: " + self.approx

    def get_m(self):
        return self.ms

    # -- subsampling schemes ---------------------------------------------------
    def uniform_subsampling(self, x, y):
        N = x.shape[0]
        self.key, sub = jax.random.split(self.key)
        C = jax.random.choice(sub, N, (self.ms,), replace=False)
        return np.asarray(C), jnp.ones(self.ms, default_dtype())

    def leverage_score_subsampling(self, x, y):
        """Ridge leverage scores ℓ_j = k_jj - k_j^T (K + s²I)^{-1} k_j (the
        GP posterior variance at the data — computed once, batched, instead
        of the reference's accept loop with per-point binomials)."""
        N = x.shape[0]
        K = self.kernel_object.gram(x)
        res = safe_cholesky(K + self.s**2 * jnp.eye(N, dtype=K.dtype))
        V = jax.scipy.linalg.solve_triangular(res.L, K, lower=True)
        lev = jnp.clip(
            jnp.diagonal(K) - jnp.sum(V * V, axis=0), 1e-12, None
        )
        p = lev / jnp.sum(lev)
        self.key, sub = jax.random.split(self.key)
        C = jax.random.choice(sub, N, (self.ms,), replace=False, p=p)
        # importance weights 1/sqrt(ms * p_j)
        w = 1.0 / jnp.sqrt(self.ms * p[C])
        return np.asarray(C), w

    def sequential_leverage_score_subsampling(self, x, y):
        """Online variant: accept point j with prob ∝ posterior variance of
        the model on points accepted so far; one pass with incremental
        Cholesky growth on a capacity buffer."""
        N, d = x.shape
        ms = self.ms
        K_full_diag = self.kernel_object.diag(x)
        chosen = [0]
        weights = [1.0]
        self.key, sub = jax.random.split(self.key)
        us = np.asarray(jax.random.uniform(sub, (N,)))
        for j in range(1, N):
            if len(chosen) >= ms:
                break
            xs = x[np.asarray(chosen)]
            K = self.kernel_object.gram(xs) + self.s**2 * jnp.eye(
                len(chosen), dtype=x.dtype
            )
            kj = self.kernel_object.cross(x[j : j + 1], xs)[0]
            sol, _ = cho_solve(safe_cholesky(K).L, kj), None
            var = float(K_full_diag[j] - kj @ sol)
            pj = min(max(var, 0.0) / float(K_full_diag[j]), 1.0)
            if us[j] < pj:
                chosen.append(j)
                weights.append(1.0 / max(np.sqrt(pj), 1e-6))
        # pad by uniform picks if underfull
        while len(chosen) < ms:
            chosen.append(int(us[len(chosen)] * N) % N)
            weights.append(1.0)
        return np.asarray(chosen), jnp.asarray(weights, default_dtype())

    def subsample(self, x, y):
        if self.approx == "uniform":
            return self.uniform_subsampling(x, y)
        if self.approx == "leverage":
            return self.leverage_score_subsampling(x, y)
        if self.approx == "online_leverage":
            return self.sequential_leverage_score_subsampling(x, y)
        raise AssertionError(self.approx)

    # -- fit -------------------------------------------------------------------
    def _build_jits(self):
        """One compiled program per phase (r5, VERDICT task 1): the r4
        eager pipeline paid ~40-80 small tunnel dispatches per fit+predict
        — the 512-sized Cholesky/solve chain alone measured 1.3-2.7 s
        rep-to-rep for <1 ms of FLOPs (benchmarks/exp_r5_config3_probe.py),
        which was the whole config-3 wall AND its 1.27 s IQR. Fused, the
        same math is 2 dispatches."""
        ko = self.kernel_object
        eps = 1e-14

        def fit_sub(pd, x, y, C, w, s):
            xs = x[C]                       # landmark gather, on device
            Dw = jnp.diag(w)
            Kl = Dw @ ko.eval_params(pd, xs, xs) @ Dw
            D, V = jnp.linalg.eigh(Kl)
            Dinv = jnp.where(D > eps,
                             1.0 / jnp.sqrt(jnp.clip(D, eps, None)), 0.0)
            Wmat = Dw @ (V * Dinv[None, :])          # (ms, ms)
            emb = ko.eval_params(pd, x, xs) @ Wmat   # (N, ms)
            K = emb.T @ emb + s * s * jnp.eye(self.ms, dtype=x.dtype)
            L = safe_cholesky(K).L
            theta = cho_solve(L, emb.T @ y)
            return xs, Wmat, emb, K, L, theta

        def factor(emb, y, s):
            K = emb.T @ emb + s * s * jnp.eye(emb.shape[1], dtype=emb.dtype)
            L = safe_cholesky(K).L
            theta = cho_solve(L, emb.T @ y)
            return K, L, theta

        def predict_sub(pd, xs, Wmat, L, theta, xtest, s):
            emb_t = ko.eval_params(pd, xtest, xs) @ Wmat
            ymean = emb_t @ theta
            temp = cho_solve(L, emb_t.T)
            diag = s * s * jnp.einsum("ij,ji->i", emb_t, temp)
            return ymean, jnp.sqrt(jnp.clip(diag, 0))[:, None]

        def predict_emb(emb_t, L, theta, s):
            ymean = emb_t @ theta
            temp = cho_solve(L, emb_t.T)
            diag = s * s * jnp.einsum("ij,ji->i", emb_t, temp)
            return ymean, jnp.sqrt(jnp.clip(diag, 0))[:, None]

        self._fit_sub_jit = jax.jit(fit_sub)
        self._factor_jit = jax.jit(factor)
        self._predict_sub_jit = jax.jit(predict_sub)
        self._predict_emb_jit = jax.jit(predict_emb)

    def fit_gp(self, x, y, eps=1e-14):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1) if y is not None else None
        self.x, self.y = x, y
        self.N, self.d = x.shape
        ko = self.kernel_object
        if getattr(self, "_fit_sub_jit", None) is None:
            self._build_jits()
        self._xs = self._Wmat = None

        if self.approx == "svd":
            self.xs = x
            K = ko.gram(x)
            D, V = jnp.linalg.eigh(K)
            V = V[:, self.N - self.ms :]
            D = jnp.clip(D[self.N - self.ms :], eps, None)
            self.eigs = D
            self.M = V / jnp.sqrt(D)[None, :]
            self._embed = lambda q: ko.cross(q, self.xs) @ self.M
        elif self.approx == "nothing":
            self.xs = x[: self.ms]
            self.M = jnp.eye(self.ms, dtype=x.dtype)
            self._embed = lambda q: ko.cross(q, self.xs)
        elif self.approx == "cover":
            Khalf_inv = symsqrt(ko.gram(x), inv=True)
            self._embed = lambda q: ko.cross(q, x) @ Khalf_inv
        elif self.approx == "positive_svd":
            # nonnegative basis: NMF of squared GP prior samples on the grid,
            # then linear interpolation (d==1) as basis functions
            from stpy_tpu.models.exact_gp import GaussianProcess

            GP = GaussianProcess(kernel=ko)
            self.key, sub = jax.random.split(self.key)
            ysample = GP.sample(x, size=self.samples, key=sub) ** 2
            W, H = nmf_multiplicative(ysample, self.ms, key=self.key)
            norms = jnp.linalg.norm(W, axis=0) + 1e-12
            basis_vals = W / norms[None, :]  # (N, ms) nonneg
            xs_grid = x[:, 0]
            order = jnp.argsort(xs_grid)
            xg, bg = xs_grid[order], basis_vals[order]

            def _embed(q):
                q = as_array(q).reshape(-1, self.d)
                return jax.vmap(
                    lambda col: jnp.interp(q[:, 0], xg, col), in_axes=1,
                    out_axes=1,
                )(bg)

            self._embed = _embed
        else:
            if self.approx == "uniform":
                # the choice itself is one small device program; the gather,
                # landmark Gram, eigh, 50k cross-embed, QᵀQ, Cholesky and
                # theta-solve all run inside ONE jitted program (r5 task 1)
                self.key, sub = jax.random.split(self.key)
                C = jax.random.choice(sub, self.N, (self.ms,), replace=False)
                w = jnp.ones(self.ms, default_dtype())
            else:
                C, w = self.subsample(x, y)
                C = jnp.asarray(C)
            yfit = y if y is not None else x[:, :1] * 0
            xs, Wmat, emb, K, L, theta = self._fit_sub_jit(
                ko.params_dict, x, yfit, C, w,
                jnp.asarray(self.s, x.dtype))
            self._xs, self._Wmat = xs, Wmat
            self._embed = lambda q: ko.cross(q, xs) @ Wmat
            self.C = C
            self.Q = emb.T
            self.K, self._L, self._theta = K, L, theta
            self.fitted = True
            return None

        emb = self._embed(x)
        yfit = y if y is not None else x[:, :1] * 0
        self.Q = emb.T
        self.K, self._L, self._theta = self._factor_jit(
            emb, yfit, jnp.asarray(self.s, x.dtype))
        self.fitted = True
        return None

    def embed(self, q):
        return self._embed(as_array(q))

    def mean_std(self, xtest):
        assert self.fitted, "First fit"
        xtest = as_array(xtest)
        s = jnp.asarray(self.s, xtest.dtype)
        if self._xs is not None:
            return self._predict_sub_jit(
                self.kernel_object.params_dict, self._xs, self._Wmat,
                self._L, self._theta, xtest, s)
        emb = self.embed(xtest)
        return self._predict_emb_jit(emb, self._L, self._theta, s)

    def outer_kernel(self):
        emb = self.embed(self.x)
        return emb @ emb.T + self.s**2 * jnp.eye(self.N, dtype=emb.dtype)

    def sample_theta(self, size=1, key=None):
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        z = jax.random.normal(key, (self.ms, size), default_dtype())
        if not self.fitted:
            return z
        # reuse the factor/theta cached by fit_gp (the r4 re-factorization
        # per call was pure dispatch overhead)
        L, theta_mean = self._L, self._theta
        # posterior covariance s² K^{-1}
        Linv_z = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        return theta_mean + self.s * Linv_z


class PositiveNystromEmbeddingBump(PositiveEmbedding):
    """Nonnegative data-optimal basis via NMF-Nyström
    (bump_bases.py:300)."""

    def __init__(self, *args, samples=300, **kwargs):
        super().__init__(*args, **kwargs)
        self.samples = max(samples, self.m)
        from stpy_tpu.domains import BorelSet

        B = BorelSet(1, np.array([[self.interval[0], self.interval[1]]]))
        xgrid = B.return_discretization(256)
        self.GP = NystromFeatures(
            self.kernel_object, m=self.m, approx="positive_svd",
            samples=self.samples,
        )
        self.GP.fit_gp(xgrid, xgrid[:, :1] * 0)

    def basis_fun(self, x, j):
        return self.GP.embed(as_array(x).reshape(-1, 1))[:, j].reshape(-1, 1)

    def _basis_matrix_1d(self, x1d):
        return self.GP.embed(x1d.reshape(-1, 1))

    def get_constraints(self):
        s = self.m**self.d
        l = jnp.zeros(s, default_dtype())
        u = jnp.full((s,), 1e10, default_dtype())
        Lambda = jnp.eye(s, dtype=default_dtype())
        return (l, Lambda, u)


class OptimalPositiveBasis(PositiveNystromEmbeddingBump):
    """Data-optimal positive basis with disk save/load of the learned basis
    (parity: stpy/embeddings/optimal_positive_basis.py:13, :53-60)."""

    def save_embedding(self, path):
        from stpy_tpu.utils.checkpoint import save_pytree

        xg = self.GP.x
        save_pytree(path, {"grid": xg, "basis": self.GP.embed(xg)})

    def load_embedding(self, path):
        from stpy_tpu.utils.checkpoint import load_pytree

        dat = load_pytree(path)
        xg, basis = dat["grid"], dat["basis"]
        order = jnp.argsort(xg[:, 0])
        xg_s, basis_s = xg[order, 0], basis[order]

        def _embed(q):
            from stpy_tpu.config import as_array as _as

            q = _as(q).reshape(-1, self.d)
            return jax.vmap(
                lambda col: jnp.interp(q[:, 0], xg_s, col), in_axes=1,
                out_axes=1,
            )(basis_s)

        self.GP._embed = _embed
        self.precomp = False
        return self
