"""Misc custom optimizers: damped Newton root solver, greedy set selection,
Hermitian trace-regression recovery.

Parity: stpy/optim/custom_optimizers.py:76 (greedy_per_step), :88/:132
(QPQC — served by opt.ellipsoid's exact TRS solvers), :258 (newton_solve),
:300 (matrix_recovery_hermitian_trace_regression). `solve_mpi` (MOSEK
mixed-integer QP, :205) is out of scope per SURVEY §2.7.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.opt.lbfgs import minimize_lbfgs


def greedy_per_step(fun, add, ground_set, minimize=True):
    """Pick the ground-set element whose addition optimizes fun
    (custom_optimizers.py:76)."""
    scores = [
        float(fun(add(ground_set[e : e + 1]))) for e in range(ground_set.shape[0])
    ]
    j = int(np.argmin(scores) if minimize else np.argmax(scores))
    return [j]


def newton_solve(f, x0, eps=1e-6, maxiter=100, verbose=False, grad=None):
    """Damped (Levenberg-style) Newton for the root of a vector field f
    (custom_optimizers.py:258): jax.jacobian + adaptive damping inside a
    lax.while_loop."""
    jac = grad if grad is not None else jax.jacobian(f)
    x0 = jnp.asarray(x0, jnp.result_type(x0, 0.5))
    d = x0.shape[0]
    eye = jnp.eye(d, dtype=x0.dtype)

    def resid(x):
        return jnp.max(f(x) ** 2)

    def cond(c):
        x, s, r, it = c
        return jnp.logical_and(r > eps, it < maxiter)

    def body(c):
        x, s, r, it = c
        J = jac(x)
        xn = x - jnp.linalg.solve(J + eye * s, f(x).reshape(-1, 1)).reshape(-1)
        rn = resid(xn)
        better = rn < r
        x = jnp.where(better, xn, x)
        r = jnp.where(better, rn, r)
        s = jnp.where(better, s / 2.0, s * 2.0)
        return x, s, r, it + 1

    x, _, _, _ = jax.lax.while_loop(
        cond, body,
        (x0, jnp.asarray(1.0, x0.dtype), resid(x0), jnp.asarray(0)),
    )
    return x


def matrix_recovery_hermitian_trace_regression(X_list, b, eps=1e-5,
                                               lam_nuc=1.0, max_iter=500):
    """Recover PSD Z with tr(X_i Z) ≈ b_i, minimal nuclear norm
    (custom_optimizers.py:300). PSD + nuclear-norm(=trace) via Z = Y Yᵀ:
    min tr(Y Yᵀ) + penalty on constraint violations; L-BFGS."""
    X = jnp.stack([jnp.asarray(Xi) for Xi in X_list], axis=0)  # (N, d, d)
    b = jnp.asarray(b).reshape(-1)
    d = X.shape[1]

    def obj(yflat):
        Y = yflat.reshape(d, d)
        Z = Y @ Y.T
        tr = jnp.einsum("nij,ji->n", X, Z)
        viol = jnp.maximum(jnp.abs(tr - b) - eps, 0.0)
        return lam_nuc * jnp.trace(Z) + 1e4 * jnp.sum(viol**2)

    res = minimize_lbfgs(
        obj, 0.1 * jnp.eye(d).ravel(), max_iter=max_iter
    )
    Y = res.x.reshape(d, d)
    return Y @ Y.T
