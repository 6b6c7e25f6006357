"""Unified Langevin family as `lax.scan` chains.

Parity: stpy/sampling/langevin.py:5 (LangevinSampler, ULA with step 1/(2L)),
sampling/proximal_langevin.py:5-20 (Proximal/Mirror stubs), and the six
Langevin variants embedded in the Poisson rate estimator
(poisson_rate_estimator.py:232-835: mirror, projected w/ OSQP prox, proximal
w/ quadprog prox, Hessian/mirror-positive, MLA', Newton).

TPU-first: every variant is ONE scan whose step fuses gradient + prox/mirror
+ noise; the per-step external QP proxes of the reference collapse to
elementwise clips because the constraint sets are axis-aligned boxes
(SURVEY.md §7). Chains vmap: `vmap(sampler)` runs independent chains on one
chip, `restart_farm` shards them across a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import power_iteration


def _scan_chain(step_fn, x0, key, steps, burn_in=0, thin=1):
    keys = jax.random.split(key, steps)

    def body(x, k):
        x = step_fn(x, k)
        return x, x

    _, xs = jax.lax.scan(body, x0, keys)
    return xs[burn_in::thin]


def ula(key, grad_f, x0, steps=500, step_size=None, lipschitz=None,
        burn_in=0, thin=1):
    """Unadjusted Langevin: x ← x - η∇f + √(2η) w, η = 1/(2L) by default
    (parity: sampling/langevin.py:14-25, L there via scipy eigsh)."""
    eta = step_size if step_size is not None else 1.0 / (2.0 * lipschitz)

    def step(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        return x - eta * grad_f(x) + jnp.sqrt(2.0 * eta) * w

    return _scan_chain(step, x0, key, steps, burn_in, thin)


def projected_langevin(key, grad_f, project, x0, steps=500, step_size=1e-3,
                       burn_in=0, thin=1):
    """Projected LMC: prox/projection after every Langevin step (replaces
    the per-step OSQP projection at poisson_rate_estimator.py:319-388)."""

    def step(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        return project(
            x - step_size * grad_f(x) + jnp.sqrt(2.0 * step_size) * w
        )

    return _scan_chain(step, x0, key, steps, burn_in, thin)


def proximal_langevin(key, grad_f, prox, x0, steps=500, step_size=1e-3,
                      burn_in=0, thin=1):
    """Proximal LMC: x ← prox_η(x - η∇f + √(2η) w) — quadprog prox at
    poisson_rate_estimator.py:390-489 becomes a closed-form prox."""

    def step(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        return prox(
            x - step_size * grad_f(x) + jnp.sqrt(2.0 * step_size) * w,
            step_size,
        )

    return _scan_chain(step, x0, key, steps, burn_in, thin)


def mirror_langevin_box(key, grad_f, l, u, x0, steps=500, step_size=1e-3,
                        burn_in=0, thin=1, eps=1e-9):
    """Mirror Langevin on a box via the entropic mirror map
    φ'(x) = log((x-l)/(u-x)) — the numerically-stable tanh reparameterization
    of the mirror/Hessian variants (poisson_rate_estimator.py:232,572,740).
    Dual noise uses the metric sqrt of φ'' (diagonal)."""
    l = jnp.asarray(l)
    u = jnp.asarray(u)
    span = u - l

    def to_dual(x):
        t = jnp.clip((x - l) / span, eps, 1 - eps)
        return jnp.log(t) - jnp.log1p(-t)

    def to_primal(y):
        return l + span * jax.nn.sigmoid(y)

    def step(y, k):
        x = to_primal(y)
        # metric: φ''(x) = 1/(x-l) + 1/(u-x); noise ~ sqrt(2η φ'')
        hess = 1.0 / jnp.clip(x - l, eps) + 1.0 / jnp.clip(u - x, eps)
        w = jax.random.normal(k, y.shape, y.dtype)
        return y - step_size * grad_f(x) + jnp.sqrt(
            2.0 * step_size * hess
        ) * w

    ys = _scan_chain(step, to_dual(x0), key, steps, burn_in, thin)
    return jax.vmap(to_primal)(ys)


def mirror_langevin_positive(key, grad_f, b, x0, steps=500, step_size=1e-3,
                             burn_in=0, thin=1, eps=1e-10, x_max=1e8):
    """Mirror Langevin with the reciprocal (log-barrier) mirror map
    φ(x) = -Σ log(x - b) on the one-sided set {x > b}.

    Re-derivation of the reference's Hessian-positive Langevin pair
    (poisson_rate_estimator.py:572 solves the mirror inversion with an inner
    Newton-CG; :740 uses the closed form). With identity constraint matrix
    the inversion IS closed-form, so both collapse to one exact scan step:

        z  = -1/(x-b) - η ∇f(x) + √(2η) · w/(x-b)     (dual update;
                                                        √φ''(x) = 1/(x-b))
        x⁺ = b - 1/z                                   (∇φ inverse)

    Distinct from `mirror_langevin_box`: different metric (quadratic blowup
    only at the lower bound, linear tails above), which is the natural
    geometry for positivity-constrained rate posteriors.
    """
    b = jnp.asarray(b)

    def step(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        g = jnp.clip(x - b, eps)
        z = -1.0 / g - step_size * grad_f(x) + jnp.sqrt(
            2.0 * step_size
        ) * w / g
        z = jnp.minimum(z, -1.0 / x_max)  # keep the inverse map finite
        return b - 1.0 / z

    return _scan_chain(step, jnp.maximum(x0, b + eps), key, steps,
                       burn_in, thin)


def mla_prime_positive(key, grad_f, b, x0, steps=100, step_size=1e-3,
                       inner=64, burn_in=0, thin=1, eps=1e-10, x_max=1e8):
    """MLA′ on {x > b} with φ(x) = -Σ log(x - b): deterministic mirror
    drift, then the dual Brownian part is SIMULATED (inner Euler substeps)
    instead of taken as one Gaussian increment.

    Re-derivation of poisson_rate_estimator.py:670-738 (the reference runs
    an inner `get_increment` path simulation per step). For this map the
    dual diffusion is dz = √(2·φ''(x(z))) dB with x(z) = b - 1/z and
    φ''(x) = 1/(x-b)² = z², i.e. geometric: dz = √2 |z| dB — each of the
    `inner` substeps multiplies z by (1 + √(2δ) ξ), δ = η/inner.
    """
    b = jnp.asarray(b)
    delta = step_size / inner

    def step(x, k):
        g = jnp.clip(x - b, eps)
        z = -1.0 / g - step_size * grad_f(x)          # drift in dual space
        sub = jax.random.split(k, inner)

        def diffuse(z, kk):
            xi = jax.random.normal(kk, z.shape, z.dtype)
            return z * (1.0 + jnp.sqrt(2.0 * delta) * xi), None

        z, _ = jax.lax.scan(diffuse, z, sub)
        z = jnp.minimum(z, -1.0 / x_max)
        return b - 1.0 / z

    return _scan_chain(step, jnp.maximum(x0, b + eps), key, steps,
                       burn_in, thin)


def newton_langevin(key, grad_f, hess_f, x0, steps=200, step_size=1.0,
                    burn_in=0, thin=1):
    """Newton-Langevin: precondition drift AND noise by the local Hessian,

        x⁺ = x - η H(x)⁻¹ ∇f(x) + √(2η) · L(x)⁻ᵀ w,   H = L Lᵀ

    (re-derivation of poisson_rate_estimator.py:790-833; the caller folds
    any barrier into grad_f/hess_f). On posteriors with cond(H) ~ 1e6+ the
    unpreconditioned chains need O(cond) steps to mix; this one is
    affine-invariant. Each step is one m x m Cholesky — m is the basis
    size, so the whole chain stays a single lax.scan on device.

    Two deviations from the reference, both bias fixes:
      * noise solves with Lᵀ so its covariance is exactly ∝ H⁻¹ (the
        reference's L⁻¹w has covariance L⁻¹L⁻ᵀ ≠ H⁻¹);
      * noise scale is √(η(2-η)) rather than √(2η): in whitened
        coordinates the chain is an AR(1) with factor (1-η), whose
        stationary variance is exactly H⁻¹ under this scale for ANY η
        (with √(2η) it is inflated by 1/(1-η/2); the reference runs η=1
        where that is a 2x variance error). At η=1 each step is an exact
        independent Gaussian draw when the target is Gaussian.
    """
    from stpy_tpu.linalg import chol_jittered

    noise_scale = jnp.sqrt(step_size * (2.0 - step_size))

    def step(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        H = hess_f(x)
        L = chol_jittered(H)
        g = jax.scipy.linalg.cho_solve((L, True), grad_f(x))
        noise = jax.scipy.linalg.solve_triangular(L.T, w, lower=False)
        return x - step_size * g + noise_scale * noise

    return _scan_chain(step, x0, key, steps, burn_in, thin)


class LangevinSampler:
    """Class parity with stpy/sampling/langevin.py:5; Lipschitz constant from
    on-device power iteration instead of scipy eigsh."""

    def __init__(self, verbose=False):
        self.verbose = verbose

    def calculate(self, hessian_fn, x0):
        H = hessian_fn(x0)
        return power_iteration(H)

    def sample(self, key, value_and_grad_f, x0, hessian_fn=None, steps=500,
               L=None):
        grad_f = lambda x: value_and_grad_f(x)[1]
        if L is None:
            L = self.calculate(
                hessian_fn if hessian_fn is not None
                else jax.hessian(lambda x: value_and_grad_f(x)[0]),
                x0,
            )
        xs = ula(key, grad_f, x0, steps=steps, lipschitz=L)
        return xs[-1]


class ProximalLangevin(LangevinSampler):
    """Parity: sampling/proximal_langevin.py:5."""

    def sample(self, key, value_and_grad_f, prox, x0, steps=500, L=1.0):
        grad_f = lambda x: value_and_grad_f(x)[1]
        xs = proximal_langevin(
            key, grad_f, prox, x0, steps=steps, step_size=1.0 / (2 * L)
        )
        return xs[-1]


class MirrorLangevin(LangevinSampler):
    """Parity: sampling/proximal_langevin.py:14."""

    def sample(self, key, value_and_grad_f, l, u, x0, steps=500,
               step_size=1e-3):
        grad_f = lambda x: value_and_grad_f(x)[1]
        xs = mirror_langevin_box(
            key, grad_f, l, u, x0, steps=steps, step_size=step_size
        )
        return xs[-1]
