"""Sliced inverse regression (SIR) dimension reduction.

Parity: stpy/dimred/sri.py:10 (SRI: standardize, slice by response,
eigen-decompose slice-mean covariance). eigh on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array
from stpy_tpu.linalg import symsqrt


class SRI:
    def __init__(self):
        self.directions = None
        self.eigvals = None

    def standardize(self, X):
        X = as_array(X)
        self.mean_ = jnp.mean(X, axis=0)
        Xc = X - self.mean_
        cov = Xc.T @ Xc / X.shape[0]
        self.W_ = symsqrt(cov + 1e-8 * jnp.eye(X.shape[1]), inv=True)
        return Xc @ self.W_

    def fit_sri(self, X, y, buckets=10):
        """Estimate the effective-dimension-reduction subspace."""
        Z = self.standardize(X)
        y = np.asarray(y).ravel()
        order = np.argsort(y)
        slices = np.array_split(order, buckets)
        means = jnp.stack(
            [jnp.mean(Z[jnp.asarray(s)], axis=0) for s in slices], axis=0
        )
        weights = jnp.asarray(
            [len(s) / len(y) for s in slices], Z.dtype
        )
        M = (means * weights[:, None]).T @ means
        w, V = jnp.linalg.eigh(M)
        # descending order; map back to original coordinates
        self.eigvals = w[::-1]
        self.directions = (self.W_ @ V[:, ::-1])
        return self.directions, self.eigvals

    fit = fit_sri

    def transform(self, X, k=1):
        X = as_array(X) - self.mean_
        return X @ self.directions[:, :k]

    def gradient_design(self, d, k, nablaF, eps=1e-4):
        """Subspace from gradient outer products (sri.py:88)."""
        G = as_array(nablaF)
        M = G.T @ G / G.shape[0]
        w, V = jnp.linalg.eigh(M)
        return V[:, ::-1][:, :k], w[::-1][:k]
