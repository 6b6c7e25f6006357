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
    max_iter: int = 150, dykstra_iters: int = 25,
):
    """max x^T θ s.t. (θ-μ)^T Σ (θ-μ) ≤ c², l ≤ Λθ ≤ u.

    Parity: stpy/helpers/ellipsoid_algorithms.py:194 (MOSEK SOC program).
    Strategy: closed form when the box is slack at the ellipsoid maximizer.
    Otherwise change variables z = Λθ (Λ invertible in all call sites: the
    positive-basis Γ^{1/2}) so the box is an exact clip, then projected
    subgradient ascent where the projection onto (ellipsoid ∩ box) is
    computed by Dykstra's alternating projections (exact ellipsoid
    projection via the secular equation). Returns (value, θ)."""
    val, theta = maximize_on_ellipsoid(x, Sigma, mu, c)
    if Lambda is None:
        return val, theta

    l = -jnp.inf if l is None else jnp.asarray(l)
    u = jnp.inf if u is None else jnp.asarray(u)
    z0 = Lambda @ theta
    feasible = jnp.all((z0 >= l - 1e-9) & (z0 <= u + 1e-9))

    if Lambda.shape[0] != Lambda.shape[1]:
        # non-square Λ (e.g. per-set integral constraints): projected
        # subgradient ascent on θ with an escalating box penalty
        eigvals, V = jnp.linalg.eigh(0.5 * (Sigma + Sigma.T))
        eigvals = jnp.clip(eigvals, 1e-14, None)
        r0 = c / jnp.sqrt(jnp.maximum(jnp.min(eigvals), 1e-14))

        def constrained_rect():
            def obj_grad(t, rho):
                zt = Lambda @ t
                over = jnp.maximum(zt - u, 0.0)
                under = jnp.maximum(l - zt, 0.0)
                return x - rho * (Lambda.T @ (over - under))

            def body(carry, k):
                t, best_t, best_val = carry
                rho = 10.0 + k
                eta = r0 / jnp.sqrt(k + 1.0)
                g = obj_grad(t, rho)
                t = project_ellipsoid(
                    t + eta * g / (jnp.linalg.norm(g) + 1e-30),
                    eigvals, V, mu, c,
                )
                zt = Lambda @ t
                feas = jnp.all((zt >= l - 1e-6) & (zt <= u + 1e-6))
                v = jnp.where(feas, x @ t, -jnp.inf)
                better = v > best_val
                return (
                    t,
                    jnp.where(better, t, best_t),
                    jnp.where(better, v, best_val),
                ), None

            t0 = project_ellipsoid(mu, eigvals, V, mu, c)
            (_, best_t, best_val), _ = jax.lax.scan(
                body, (t0, t0, -jnp.inf),
                jnp.arange(max_iter, dtype=t0.dtype),
            )
            # fall back to the center if nothing feasible was found
            return jnp.where(jnp.isfinite(best_val), best_t, mu)

        theta_c = jax.lax.cond(feasible, lambda: theta, constrained_rect)
        return x @ theta_c, theta_c

    # z-space problem data
    Lam_inv = jnp.linalg.inv(Lambda)
    xz = Lam_inv.T @ x
    Sz = Lam_inv.T @ Sigma @ Lam_inv
    Sz = 0.5 * (Sz + Sz.T)
    zmu = Lambda @ mu
    eigvals, V = jnp.linalg.eigh(Sz)
    eigvals = jnp.clip(eigvals, 1e-14, None)

    def proj_C(z):
        """Dykstra projection onto {ellipsoid} ∩ {box} in z-space."""
        def body(state, _):
            z, p, q = state
            a = project_ellipsoid(z + p, eigvals, V, zmu, c)
            p = z + p - a
            b = jnp.clip(a + q, l, u)
            q = a + q - b
            return (b, p, q), None

        (z, _, _), _ = jax.lax.scan(
            body, (z, jnp.zeros_like(z), jnp.zeros_like(z)), None,
            length=dykstra_iters,
        )
        return z

    def constrained():
        # step scale: ellipsoid extent along xz
        r0 = c / jnp.sqrt(jnp.maximum(jnp.min(eigvals), 1e-14))
        gnorm = jnp.linalg.norm(xz) + 1e-30
        z_init = proj_C(jnp.clip(zmu, l, u))

        def body(carry, k):
            z, best_z, best_val = carry
            eta = r0 / jnp.sqrt(k + 1.0)
            z = proj_C(z + eta * xz / gnorm)
            v = xz @ z
            better = v > best_val
            best_z = jnp.where(better, z, best_z)
            best_val = jnp.where(better, v, best_val)
            return (z, best_z, best_val), None

        (_, best_z, _), _ = jax.lax.scan(
            body, (z_init, z_init, xz @ z_init),
            jnp.arange(max_iter, dtype=z_init.dtype),
        )
        return Lam_inv @ best_z

    theta_c = jax.lax.cond(feasible, lambda: theta, constrained)
    return x @ theta_c, theta_c


def KY_initialization(X):
    """Kumar-Yildirim initial core set for MVE: pick extreme points along
    successively deflated directions (parity: ellipsoid_algorithms.py:287)."""
    import numpy as np

    X = np.asarray(X)
    n, d = X.shape
    dirs = np.eye(d)
    picked = []
    basis = []
    for i in range(d):
        u = dirs[i]
        for b in basis:
            u = u - (u @ b) * b
        if np.linalg.norm(u) < 1e-12:
            continue
        u = u / np.linalg.norm(u)
        proj = X @ u
        picked.extend([int(np.argmin(proj)), int(np.argmax(proj))])
        v = X[picked[-1]] - X[picked[-2]]
        if np.linalg.norm(v) > 1e-12:
            basis.append(v / np.linalg.norm(v))
    return sorted(set(picked))


def maximum_volume_ellipsoid(X, tol=1e-6, max_iter=2000):
    """Khachiyan's algorithm for the minimum-volume enclosing ellipsoid of
    points X (n, d): returns (center c, shape A) with
    (x-c)ᵀ A (x-c) ≤ 1 for all points (parity: ellipsoid_algorithms.py:
    9-193 — host-side numpy; a design-time computation)."""
    import numpy as np

    X = np.asarray(X, dtype=float)
    n, d = X.shape
    Q = np.vstack([X.T, np.ones(n)])  # (d+1, n)
    u = np.ones(n) / n
    for _ in range(max_iter):
        V = Q @ np.diag(u) @ Q.T
        M = np.einsum("in,ij,jn->n", Q, np.linalg.inv(V), Q)
        j = int(np.argmax(M))
        step = (M[j] - d - 1.0) / ((d + 1) * (M[j] - 1.0))
        new_u = (1 - step) * u
        new_u[j] += step
        if np.linalg.norm(new_u - u) < tol:
            u = new_u
            break
        u = new_u
    c = X.T @ u
    cov = X.T @ np.diag(u) @ X - np.outer(c, c)
    A = np.linalg.inv(cov) / d
    return c, A


def ellipsoid_cut(c, B, g):
    """Central ellipsoid cut: smallest ellipsoid containing the half
    {x: gᵀ(x-c) ≤ 0} ∩ E(c, B) (parity: ellipsoid_algorithms.py:167)."""
    d = c.shape[0]
    Bg = B @ g
    denom = jnp.sqrt(jnp.maximum(g @ Bg, 1e-30))
    b = Bg / denom
    c_new = c - b / (d + 1.0)
    B_new = (d * d / (d * d - 1.0)) * (
        B - (2.0 / (d + 1.0)) * jnp.outer(b, b)
    )
    return c_new, B_new


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
