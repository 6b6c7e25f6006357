"""Stochastic Lanczos quadrature (SLQ): matvec-only log-determinant and
trace estimation — the scalable companion to CG inference.

log det(A) = tr(log A) ≈ (n/p) Σ_probes  e₁ᵀ f(T_probe) e₁ · ||z||²

where T is the Lanczos tridiagonal of A started at a Rademacher probe z.
Every Lanczos iteration is ONE matvec — with the row-sharded matvec from
`IterativeGP` this gives distributed evidence evaluation at n far beyond a
dense Cholesky (GPyTorch-style BBMM inference, TPU-native: the Lanczos
recurrence is a lax.scan, probes vmap, matvecs shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lanczos_tridiag(matvec, z, iters: int):
    """Lanczos: returns (alphas (iters,), betas (iters-1,)) for the
    tridiagonal T with A ≈ Q T Qᵀ started at q1 = z/||z||.

    Full orthogonalization is skipped (standard for SLQ; loss of
    orthogonality biases extreme Ritz values only mildly for logdet)."""
    znorm = jnp.linalg.norm(z)
    q = z / znorm

    def body(carry, _):
        q_prev, q_cur, beta_prev = carry
        w = matvec(q_cur)
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return (q_cur, q_next, beta), (alpha, beta)

    init = (jnp.zeros_like(q), q, jnp.asarray(0.0, q.dtype))
    _, (alphas, betas) = jax.lax.scan(body, init, None, length=iters)
    return alphas, betas[:-1], znorm


def slq_logdet(matvec, n, probes=16, lanczos_iters=30, key=None,
               dtype=jnp.float32):
    """Estimate log det(A) for SPD A given only `matvec`.

    Returns (estimate, per-probe values). Eigendecomposition of the tiny
    (iters x iters) tridiagonals runs on device via eigh."""
    key = key if key is not None else jax.random.PRNGKey(0)

    def one_probe(k):
        z = jax.random.rademacher(k, (n,)).astype(dtype)
        alphas, betas, znorm = lanczos_tridiag(matvec, z, lanczos_iters)
        T = (
            jnp.diag(alphas)
            + jnp.diag(betas, 1)
            + jnp.diag(betas, -1)
        )
        w, V = jnp.linalg.eigh(T)
        w = jnp.clip(w, 1e-30)
        tau = V[0, :] ** 2  # weights of the Gauss quadrature
        return znorm**2 * jnp.sum(tau * jnp.log(w))

    keys = jax.random.split(key, probes)
    vals = jax.vmap(one_probe)(keys)
    return jnp.mean(vals), vals


def slq_trace_fn(matvec, n, fn, probes=16, lanczos_iters=30, key=None,
                 dtype=jnp.float32):
    """tr(f(A)) for arbitrary scalar f via the same machinery."""
    key = key if key is not None else jax.random.PRNGKey(0)

    def one_probe(k):
        z = jax.random.rademacher(k, (n,)).astype(dtype)
        alphas, betas, znorm = lanczos_tridiag(matvec, z, lanczos_iters)
        T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        w, V = jnp.linalg.eigh(T)
        tau = V[0, :] ** 2
        return znorm**2 * jnp.sum(tau * fn(w))

    keys = jax.random.split(key, probes)
    return jnp.mean(jax.vmap(one_probe)(keys))


def evidence_matvec_only(matvec, y, n, probes=16, lanczos_iters=30,
                         cg_tol=1e-8, cg_maxiter=500, key=None):
    """Negative log evidence 0.5 yᵀ(K+σ²I)⁻¹y + 0.5 log det(K+σ²I) using
    only matvecs: CG for the solve, SLQ for the logdet. Pairs with the
    row-sharded matvec of IterativeGP for multi-chip evidence at large n."""
    from stpy_tpu.parallel.iterative import cg_solve

    yv = jnp.asarray(y).reshape(-1)
    alpha, it, res = cg_solve(matvec, yv, tol=cg_tol, maxiter=cg_maxiter)
    quad = 0.5 * yv @ alpha
    ld, _ = slq_logdet(
        matvec, n, probes=probes, lanczos_iters=lanczos_iters, key=key,
        dtype=yv.dtype,
    )
    return quad + 0.5 * ld
