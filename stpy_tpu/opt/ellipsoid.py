"""Ellipsoid-constrained maximizers — the on-device replacement for the
cvxpy/MOSEK QCQPs in stpy/helpers/ellipsoid_algorithms.py:194-286 (the inner
problem of every UCB/LCB per-action bound in the point-process stack).

Problems solved:
  maximize_on_ellipsoid:        max x^T θ  s.t. (θ-μ)^T Σ (θ-μ) ≤ c²
                                 → closed form μ + c Σ^{-1}x / sqrt(x^TΣ^{-1}x)
  maximize_on_elliptical_slice: + box constraints l ≤ Λθ ≤ u
                                 → closed form when the box is inactive,
                                   else projected (FISTA + exact Euclidean
                                   ellipsoid projection by secular-equation
                                   Newton) with a quadratic box penalty.
All are jit/vmap-safe → one vmapped call bounds every action at once, where
the reference solves one MOSEK cone program per action
(poisson_rate_estimator.py:1391-1403).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import safe_cholesky, cho_solve


def maximize_on_ellipsoid(x, Sigma, mu, c):
    """max x^T θ over the ellipsoid (θ-μ)^T Σ (θ-μ) ≤ c². Returns (val, θ*)."""
    L = safe_cholesky(Sigma).L
    Sinv_x = cho_solve(L, x)
    denom = jnp.sqrt(jnp.maximum(x @ Sinv_x, 1e-30))
    theta = mu + (c / denom) * Sinv_x
    return x @ theta, theta


def project_ellipsoid(p, eigvals, V, mu, c, iters: int = 40):
    """Exact Euclidean projection of p onto {θ: (θ-μ)^T Σ (θ-μ) ≤ c²},
    Σ = V diag(eigvals) V^T. Newton on the secular equation in eigenbasis."""
    z = V.T @ (p - mu)

    def quad(lam):
        w = z / (1.0 + lam * eigvals)
        return jnp.sum(eigvals * w * w) - c * c

    inside = quad(0.0) <= 0.0

    def solve():
        def body(carry, _):
            lam = carry
            f = quad(lam)
            df = jax.grad(quad)(lam)
            lam_new = lam - f / jnp.where(jnp.abs(df) < 1e-30, -1e-30, df)
            return jnp.maximum(lam_new, 0.0), None

        lam, _ = jax.lax.scan(body, jnp.asarray(1.0, p.dtype), None,
                              length=iters)
        w = z / (1.0 + lam * eigvals)
        return mu + V @ w

    return jnp.where(inside, p, solve())


def maximize_on_elliptical_slice(
    x, Sigma, mu, c, l=None, Lambda=None, u=None,
    penalty: float = 1e4, max_iter: int = 300,
):
    """max x^T θ s.t. (θ-μ)^T Σ (θ-μ) ≤ c², l ≤ Λθ ≤ u.

    Parity: stpy/helpers/ellipsoid_algorithms.py:194 (MOSEK SOC program).
    Strategy: closed form if the box is slack at the ellipsoid maximizer;
    otherwise penalized projected ascent with the exact ellipsoid projection.
    Returns (value, θ)."""
    val, theta = maximize_on_ellipsoid(x, Sigma, mu, c)
    if Lambda is None:
        return val, theta

    l = -jnp.inf if l is None else l
    u = jnp.inf if u is None else u
    z = Lambda @ theta
    feasible = jnp.all((z >= l - 1e-9) & (z <= u + 1e-9))

    eigvals, V = jnp.linalg.eigh(Sigma)
    eigvals = jnp.clip(eigvals, 1e-12, None)

    def constrained():
        def obj(t):
            zt = Lambda @ t
            viol = jnp.maximum(zt - u, 0.0) ** 2 + jnp.maximum(l - zt, 0.0) ** 2
            return -(x @ t) + 0.5 * penalty * jnp.sum(viol)

        g = jax.grad(obj)
        # Lipschitz of penalty part ~ penalty * ||Λ||²; step accordingly
        lam_max = jnp.linalg.norm(Lambda, ord="fro") ** 2
        step = 1.0 / (penalty * lam_max + 1e-9)

        def body(t, _):
            t = t - step * g(t)
            t = project_ellipsoid(t, eigvals, V, mu, c)
            return t, None

        t, _ = jax.lax.scan(body, mu, None, length=max_iter)
        return t

    theta_c = jax.lax.cond(feasible, lambda: theta, constrained)
    return x @ theta_c, theta_c


def maximize_matrix_quadratic_on_ellipse(Z, Sigma, mu, c, iters=60):
    """max θᵀZθ s.t. (θ-μ)ᵀΣ(θ-μ) ≤ c² — exact trust-region subproblem
    (parity: ellipsoid_algorithms.py:218, MOSEK QCQP there).

    Whitened: θ = μ + A w with A = Σ^{-1/2}, ||w|| ≤ c. Maximize
    wᵀBw + 2bᵀw + const: the maximizer lies on the boundary (B ⪰ 0 case of
    interest); solve the secular equation ||(λI - B)^{-1} b|| = c for
    λ > λ_max(B) by bisection in eigenbasis. Returns (val, θ*)."""
    eigS, VS = jnp.linalg.eigh(Sigma)
    eigS = jnp.clip(eigS, 1e-12, None)
    A = (VS / jnp.sqrt(eigS)[None, :]) @ VS.T  # Σ^{-1/2}
    B = A @ Z @ A
    b = A @ (Z @ mu)
    d, V = jnp.linalg.eigh(B)
    bt = V.T @ b
    lam_max = d[-1]

    def norm_w(lam):
        w = bt / (lam - d)
        return jnp.sqrt(jnp.sum(w * w))

    # bisection on (lam_max + eps, lam_hi)
    eps = 1e-10 + 1e-8 * jnp.abs(lam_max)
    lo = lam_max + eps
    hi = lam_max + jnp.linalg.norm(b) / jnp.maximum(c, 1e-12) + 1.0

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        too_big = norm_w(mid) > c  # ||w|| decreasing in λ
        return jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    lam = 0.5 * (lo + hi)
    w = V @ (bt / (lam - d))
    # degenerate b≈0: take the top eigenvector direction at radius c
    w = jnp.where(jnp.linalg.norm(b) < 1e-14, c * V[:, -1], w)
    theta = mu + A @ w
    return theta @ (Z @ theta), theta


def minimize_matrix_quadratic_on_ellipse(Z, Sigma, mu, c, max_iter=200):
    """min θᵀZθ over the ellipsoid (Z ⪰ 0, convex): 0 if 0 is feasible,
    else projected FISTA with the exact ellipsoid projection
    (parity: ellipsoid_algorithms.py:230)."""
    r0 = (0.0 - mu) @ (Sigma @ (0.0 - mu))
    eigvals, V = jnp.linalg.eigh(Sigma)
    eigvals = jnp.clip(eigvals, 1e-12, None)

    def solve():
        def obj(t):
            return t @ (Z @ t)

        g = jax.grad(obj)
        L = jnp.linalg.norm(Z, ord="fro") + 1e-9
        step = 1.0 / L

        def body(t, _):
            t = t - step * g(t)
            t = project_ellipsoid(t, eigvals, V, mu, c)
            return t, None

        t, _ = jax.lax.scan(body, mu, None, length=max_iter)
        return obj(t), t

    val0 = jnp.zeros(())
    inside = r0 <= c * c
    valc, thetac = solve()
    val = jnp.where(inside, 0.0, valc)
    theta = jnp.where(inside, jnp.zeros_like(mu), thetac)
    return val, theta


def maximize_quadratic_on_ellipse(x, Sigma, mu, c):
    """max (x^T θ)² over the ellipsoid — the two-sided linear bound
    (parity: ellipsoid_algorithms.py:252). max of |x^Tθ| is attained at one
    of the two closed-form linear maximizers."""
    v_plus, t_plus = maximize_on_ellipsoid(x, Sigma, mu, c)
    v_minus, t_minus = maximize_on_ellipsoid(-x, Sigma, mu, c)
    take_plus = v_plus**2 >= v_minus**2
    val = jnp.where(take_plus, v_plus**2, v_minus**2)
    theta = jnp.where(take_plus, t_plus, t_minus)
    return val, theta


def minimize_quadratic_on_ellipse(x, Sigma, mu, c):
    """min (x^T θ)² over the ellipsoid: 0 if the hyperplane x^Tθ=0 cuts the
    ellipsoid, else the squared distance-to-zero of the nearer side."""
    v_plus, _ = maximize_on_ellipsoid(x, Sigma, mu, c)    # max x^Tθ
    v_minus, _ = maximize_on_ellipsoid(-x, Sigma, mu, c)  # max -x^Tθ = -min
    lo, hi = -v_minus, v_plus
    crosses = (lo <= 0.0) & (hi >= 0.0)
    val = jnp.where(crosses, 0.0, jnp.minimum(lo**2, hi**2))
    return val
