"""Coreset construction: ε-nets and greedy leverage-score coresets.

Parity: stpy/helpers/coreset_helper.py:5 (epsilon_net), :9 (coreset),
:13 (coreset_leverage_score_greedy). Posterior-variance (= ridge leverage)
greedy selection runs as incremental Cholesky growth on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from stpy_tpu.linalg import safe_cholesky


def epsilon_net(borel_set, k):
    """Uniform tensor grid with k points per dim over the set."""
    return borel_set.return_discretization(k)


def coreset(borel_set, k):
    return epsilon_net(borel_set, k)


def coreset_leverage_score_greedy(borel_set, kernel, n, tol=1e-3,
                                  grid=64, s=1e-3):
    """Greedily pick points maximizing GP posterior variance over a candidate
    grid until n points or max variance < tol (coreset_helper.py:13)."""
    X = borel_set.return_discretization(grid)
    kd = kernel.diag(X)
    chosen = []
    for _ in range(n):
        if not chosen:
            var = kd
        else:
            xs = X[jnp.asarray(chosen)]
            K = kernel.gram(xs) + s * jnp.eye(len(chosen), dtype=X.dtype)
            L = safe_cholesky(K).L
            C = kernel.cross(X, xs)
            V = jnp.linalg.solve(L, C.T)
            var = kd - jnp.sum(V * V, axis=0)
        j = int(jnp.argmax(var))
        if float(var[j]) < tol:
            break
        chosen.append(j)
    return X[jnp.asarray(chosen)]
