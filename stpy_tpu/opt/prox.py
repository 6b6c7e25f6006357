"""Proximal / projection operators and first-order constrained solvers.

This is the on-device replacement layer for cvxpy+MOSEK/quadprog/OSQP calls
in the reference (SURVEY.md §7 hard-part #1): the point-process MAP fits
reduce to smooth objectives with box constraints (prox = clip), MKL needs the
simplex projection, group-lasso MKL needs the group soft-threshold. Every
solver here is a `lax.while_loop`/`scan` — jit, grad (via implicit diff on
fixed points where needed), and vmap all apply.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


# -- projections / proxes -----------------------------------------------------

def prox_box(x, lo=-jnp.inf, hi=jnp.inf):
    """Projection onto an axis-aligned box (replaces the per-step quadprog QP
    prox at stpy/point_processes/poisson_rate_estimator.py:401-404 — the
    constraint set there is axis-aligned, so the exact prox is a clip)."""
    return jnp.clip(x, lo, hi)


def prox_l1(x, thresh):
    """Soft-threshold (L1 prox)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thresh, 0.0)


def prox_group_l2(x, thresh, groups):
    """Group soft-threshold: block shrink per index-group (group lasso,
    parity: stpy/continuous_processes/mkl_features.py objective)."""
    out = x
    for g in groups:
        idx = jnp.asarray(g)
        v = x[idx]
        nrm = jnp.linalg.norm(v)
        scale = jnp.maximum(1.0 - thresh / jnp.maximum(nrm, 1e-30), 0.0)
        out = out.at[idx].set(v * scale)
    return out


def project_simplex(x):
    """Euclidean projection onto the probability simplex (sort-based,
    O(n log n)); replaces simplex-constrained cvxpy in MKL."""
    n = x.shape[0]
    u = jnp.sort(x)[::-1]
    css = jnp.cumsum(u)
    ks = jnp.arange(1, n + 1)
    cond = u + (1.0 - css) / ks > 0
    rho = jnp.max(jnp.where(cond, ks, 0))
    lam = (1.0 - css[rho - 1]) / rho
    return jnp.maximum(x + lam, 0.0)


def project_l2_ball(x, radius=1.0):
    nrm = jnp.linalg.norm(x)
    return jnp.where(nrm > radius, x * (radius / nrm), x)


# -- solvers ------------------------------------------------------------------

class SolveResult(NamedTuple):
    x: jnp.ndarray
    value: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def projected_gradient(
    fun: Callable, x0: jnp.ndarray, project: Callable,
    lr: float | None = None, max_iter: int = 500, tol: float = 1e-9,
    lipschitz: float | None = None,
) -> SolveResult:
    """Projected gradient descent with fixed step 1/L."""
    step = (1.0 / lipschitz) if lipschitz is not None else (lr or 1e-2)
    g = jax.grad(fun)

    def cond(c):
        x, xp, it = c
        return jnp.logical_and(it < max_iter, jnp.linalg.norm(x - xp) > tol)

    def body(c):
        x, _, it = c
        xn = project(x - step * g(x))
        return xn, x, it + 1

    x1 = project(x0 - step * g(x0))
    x, xp, it = jax.lax.while_loop(cond, body, (x1, x0, jnp.asarray(1)))
    return SolveResult(x, fun(x), it, jnp.linalg.norm(x - xp) <= tol)


def projected_fista(
    fun: Callable, x0: jnp.ndarray, project: Callable,
    lipschitz: float, max_iter: int = 500, tol: float = 1e-9,
) -> SolveResult:
    """FISTA (accelerated proximal gradient) with projection prox.

    The workhorse for box-constrained MAP fits (penalized Poisson likelihood,
    positive-basis regression): O(1/k²) on smooth convex objectives, every
    iteration a fused gradient + clip on device."""
    step = 1.0 / lipschitz
    g = jax.grad(fun)

    def cond(c):
        x, y, t, xp, it = c
        return jnp.logical_and(it < max_iter, jnp.linalg.norm(x - xp) > tol)

    def body(c):
        x, y, t, _, it = c
        xn = project(y - step * g(y))
        tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        yn = xn + ((t - 1.0) / tn) * (xn - x)
        return xn, yn, tn, x, it + 1

    x0 = jnp.asarray(x0)
    state = (x0, x0, jnp.asarray(1.0, x0.dtype), x0 + 1.0, jnp.asarray(0))
    x, y, t, xp, it = jax.lax.while_loop(cond, body, state)
    return SolveResult(x, fun(x), it, jnp.linalg.norm(x - xp) <= tol)


def fista_prox_backtracking(
    fun: Callable, x0: jnp.ndarray, prox: Callable,
    l0: float = 1.0, eta: float = 2.0, max_iter: int = 500, tol: float = 1e-9,
) -> SolveResult:
    """FISTA for composite objectives fun + g with prox_g: `prox(x, step)`
    receives the current step size 1/L (needed by shrinkage proxes like the
    group soft-threshold; plain projections can ignore it)."""
    vg = jax.value_and_grad(fun)

    def bt(y, fy, gy, L):
        def cond(c):
            L, done = c[0], c[1]
            return jnp.logical_and(~done, L < 1e18)

        def body(c):
            L, _, _ = c
            xn = prox(y - gy / L, 1.0 / L)
            diff = xn - y
            q = fy + jnp.vdot(gy, diff) + 0.5 * L * jnp.vdot(diff, diff)
            ok = fun(xn) <= q + 1e-12
            return jax.lax.cond(
                ok, lambda: (L, True, xn), lambda: (L * eta, False, xn)
            )

        xn0 = prox(y - gy / L, 1.0 / L)
        L, _, xn = jax.lax.while_loop(cond, body, (L, False, xn0))
        return L, xn

    def cond(c):
        x, y, t, L, xp, it = c
        return jnp.logical_and(it < max_iter, jnp.linalg.norm(x - xp) > tol)

    def body(c):
        x, y, t, L, _, it = c
        fy, gy = vg(y)
        L, xn = bt(y, fy, gy, L)
        tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        yn = xn + ((t - 1.0) / tn) * (xn - x)
        return xn, yn, tn, L, x, it + 1

    x0 = jnp.asarray(x0)
    st = (x0, x0, jnp.asarray(1.0, x0.dtype), jnp.asarray(l0, x0.dtype),
          x0 + 1.0, jnp.asarray(0))
    x, y, t, L, xp, it = jax.lax.while_loop(cond, body, st)
    return SolveResult(x, fun(x), it, jnp.linalg.norm(x - xp) <= tol)


def fista_backtracking(
    fun: Callable, x0: jnp.ndarray, project: Callable,
    l0: float = 1.0, eta: float = 2.0, max_iter: int = 500, tol: float = 1e-9,
    max_bt: int = 30,
) -> SolveResult:
    """FISTA with backtracking line-search on the Lipschitz estimate —
    no eigenvalue precomputation needed."""
    vg = jax.value_and_grad(fun)

    def bt(y, fy, gy, L):
        def cond(c):
            L, done = c[0], c[1]
            return jnp.logical_and(~done, L < 1e18)

        def body(c):
            L, _, _ = c
            xn = project(y - gy / L)
            diff = xn - y
            q = fy + jnp.vdot(gy, diff) + 0.5 * L * jnp.vdot(diff, diff)
            ok = fun(xn) <= q + 1e-12
            return jax.lax.cond(
                ok, lambda: (L, True, xn), lambda: (L * eta, False, xn)
            )

        xn0 = project(y - gy / L)
        L, _, xn = jax.lax.while_loop(cond, body, (L, False, xn0))
        return L, xn

    def cond(c):
        x, y, t, L, xp, it = c
        return jnp.logical_and(it < max_iter, jnp.linalg.norm(x - xp) > tol)

    def body(c):
        x, y, t, L, _, it = c
        fy, gy = vg(y)
        L, xn = bt(y, fy, gy, L)
        tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        yn = xn + ((t - 1.0) / tn) * (xn - x)
        return xn, yn, tn, L, x, it + 1

    x0 = jnp.asarray(x0)
    st = (x0, x0, jnp.asarray(1.0, x0.dtype), jnp.asarray(l0, x0.dtype),
          x0 + 1.0, jnp.asarray(0))
    x, y, t, L, xp, it = jax.lax.while_loop(cond, body, st)
    return SolveResult(x, fun(x), it, jnp.linalg.norm(x - xp) <= tol)
