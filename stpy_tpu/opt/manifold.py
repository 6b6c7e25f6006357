"""Riemannian optimization on Stiefel and PSD manifolds (replaces pymanopt
SteepestDescent, stpy/optim/manifold_optimization.py:7 and the
Stiefel/PSDFixedRank hyperopt presets in stpy/estimator.py + gauss_procc.py
:669-689).

Stiefel: projection of the Euclidean gradient onto the tangent space +
QR retraction, as a lax.scan (restarts vmap). PSD fixed-rank: optimize the
Cholesky-like factor Y with A = Y Yᵀ (quotient-manifold parameterization) —
plain L-BFGS in factor space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.opt.lbfgs import minimize_lbfgs


def _qr_retract(X):
    Q, R = jnp.linalg.qr(X)
    # sign-fix for uniqueness
    s = jnp.sign(jnp.diagonal(R))
    s = jnp.where(s == 0, 1.0, s)
    return Q * s[None, :]


def stiefel_project_tangent(X, G):
    """Project Euclidean grad G at X onto the Stiefel tangent space."""
    XtG = X.T @ G
    sym = 0.5 * (XtG + XtG.T)
    return G - X @ sym


def optimize_stiefel(fun, n, p, steps=300, lr=0.1, restarts=4, key=None):
    """Minimize fun(X) over the Stiefel manifold {X in R^{n x p}: XᵀX = I}
    by projected gradient + QR retraction; vmapped random restarts."""
    key = key if key is not None else jax.random.PRNGKey(0)
    g = jax.grad(fun)

    def run(key):
        X0 = _qr_retract(
            jax.random.normal(key, (n, p), default_dtype())
        )

        def body(X, _):
            G = stiefel_project_tangent(X, g(X))
            X = _qr_retract(X - lr * G)
            return X, None

        X, _ = jax.lax.scan(body, X0, None, length=steps)
        return X, fun(X)

    keys = jax.random.split(key, restarts)
    Xs, vals = jax.vmap(run)(keys)
    best = jnp.nanargmin(vals)
    return Xs[best], vals[best]


def optimize_psd(fun, d, rank=None, steps=300, restarts=4, key=None,
                 max_iter=200):
    """Minimize fun(A) over PSD matrices A (fixed rank r) via A = Y Yᵀ."""
    key = key if key is not None else jax.random.PRNGKey(0)
    r = rank or d

    def wrapped(yflat):
        Y = yflat.reshape(d, r)
        return fun(Y @ Y.T)

    def run(k):
        y0 = 0.3 * jax.random.normal(k, (d * r,), default_dtype())
        res = minimize_lbfgs(wrapped, y0, max_iter=max_iter)
        return res.x, res.value

    keys = jax.random.split(key, restarts)
    ys, vals = jax.vmap(run)(keys)
    best = jnp.nanargmin(vals)
    Y = ys[best].reshape(d, r)
    return Y @ Y.T, vals[best]
