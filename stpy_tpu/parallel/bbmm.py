"""Matrix-free evidence (log-marginal) value and gradients — BBMM-style
inference: everything is CG solves + Hutchinson/SLQ probes against the lazy
Pallas Gram matvec, so hyperparameter optimization runs at n far beyond what
a dense Cholesky can hold (GPyTorch's BBMM recipe, built TPU-native).

For A(θ) = κ·K̃(γ) + σ²I:

    ∂NLL/∂θ = −½ αᵀ(∂A/∂θ)α + ½ tr(A⁻¹ ∂A/∂θ),   α = A⁻¹y

* the quadratic term needs ONE extra matvec per θ (∂A/∂γ uses the fused
  derivative-shape matvec k'(sq)·sq, see ops/pallas_gram_matvec._dshape_fn);
* the trace term uses Rademacher probes: per probe one CG solve w = A⁻¹z
  shared across all θ, then one ∂A-matvec each;
* the NLL value itself uses SLQ for the logdet.

Gradients here are EXACT analytic formulas evaluated with stochastic trace
estimation — not autodiff through the CG while_loop (which reverse-mode
cannot cross).

New capability vs the reference (torch f64 slogdet at gauss_procc.py:631-638
— dense only).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from stpy_tpu.ops.pallas_gram_matvec import gram_matvec
from stpy_tpu.parallel.iterative import cg_solve
from stpy_tpu.parallel.slq import slq_logdet


def evidence_value_and_grad_lazy(
    x, y, gamma, kappa=1.0, noise=0.1, *, family="se", nu=1.5,
    probes=16, lanczos_iters=30, cg_tol=1e-6, cg_maxiter=500, key=None,
    compute_value=True,
):
    """Negative log evidence and its gradient w.r.t. (gamma, kappa, noise),
    using only lazy matvecs — O(n) memory.

    Returns (nll, grads) with grads = {"gamma", "kappa", "noise"}.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    yv = jnp.asarray(y).reshape(-1)
    n = yv.shape[0]

    def Av(v):
        return (
            gram_matvec(x, x, v, family=family, gamma=gamma, kappa=kappa,
                        nu=nu)
            + (noise * noise) * v.reshape(-1)
        )

    def dA_gamma_v(v):
        return (-2.0 / gamma) * gram_matvec(
            x, x, v, family=family, gamma=gamma, kappa=kappa, nu=nu,
            deriv=True,
        )

    def dA_kappa_v(v):
        return gram_matvec(x, x, v, family=family, gamma=gamma, kappa=1.0,
                           nu=nu)

    alpha, _, _ = cg_solve(Av, yv, tol=cg_tol, maxiter=cg_maxiter)

    # value: ½ yᵀα + ½ logdet (SLQ) + (n/2) log 2π. The logdet is only
    # needed for reporting — gradient steps can skip it (compute_value=False)
    if compute_value:
        ld, _ = slq_logdet(Av, n, probes=probes,
                           lanczos_iters=lanczos_iters, key=key,
                           dtype=yv.dtype)
        nll = (0.5 * yv @ alpha + 0.5 * ld
               + 0.5 * n * math.log(2.0 * math.pi))
    else:
        nll = jnp.nan

    # quadratic terms: −½ αᵀ (∂A) α
    q_gamma = -0.5 * alpha @ dA_gamma_v(alpha)
    q_kappa = -0.5 * alpha @ dA_kappa_v(alpha)
    q_noise = -0.5 * 2.0 * noise * (alpha @ alpha)

    # trace terms: ½ E_z [(A⁻¹z)ᵀ (∂A z)], one CG per probe, shared over θ
    def one_probe(k):
        z = jax.random.rademacher(k, (n,)).astype(yv.dtype)
        w, _, _ = cg_solve(Av, z, tol=cg_tol, maxiter=cg_maxiter)
        return jnp.stack(
            [w @ dA_gamma_v(z), w @ dA_kappa_v(z),
             2.0 * noise * (w @ z)]
        )

    keys = jax.random.split(jax.random.fold_in(key, 1), probes)
    traces = jnp.mean(jax.lax.map(one_probe, keys), axis=0)

    grads = {
        "gamma": q_gamma + 0.5 * traces[0],
        "kappa": q_kappa + 0.5 * traces[1],
        "noise": q_noise + 0.5 * traces[2],
    }
    return nll, grads
