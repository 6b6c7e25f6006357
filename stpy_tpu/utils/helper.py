"""Small numeric helpers (TPU-native rewrite of stpy/helpers/helper.py).

Reference parity: stpy/helpers/helper.py:27 (cartesian), :112 (symsqrt),
:125 (interval). Host-side grid construction stays in numpy (design-time);
device math is jnp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import default_dtype


def cartesian(arrays: list[np.ndarray]) -> np.ndarray:
    """Cartesian product of 1-D arrays, shape (prod(len_i), d).

    Row-major ordering: first array varies slowest (matches
    stpy/helpers/helper.py:27 semantics used by BorelSet discretizations).
    """
    arrays = [np.asarray(a).ravel() for a in arrays]
    grids = np.meshgrid(*arrays, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


def interval(n: int, d: int, L_infinity_ball: float = 1.0, offset=None) -> jnp.ndarray:
    """Tensor-grid of n points per dim over [-L, L]^d (test grids).

    Mirrors stpy/helpers/helper.py:125.
    """
    xs = [np.linspace(-L_infinity_ball, L_infinity_ball, n) for _ in range(d)]
    if offset is not None:
        xs = [x + o for x, o in zip(xs, np.asarray(offset).ravel())]
    return jnp.asarray(cartesian(xs), dtype=default_dtype())


def interval_grid(n: int, d: int, bounds: np.ndarray) -> jnp.ndarray:
    """Tensor grid with explicit per-dim (low, high) bounds, shape (n**d, d)."""
    bounds = np.asarray(bounds, dtype=float).reshape(d, 2)
    xs = [np.linspace(bounds[i, 0], bounds[i, 1], n) for i in range(d)]
    return jnp.asarray(cartesian(xs), dtype=default_dtype())


def symsqrt(A: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD matrix square root via eigh (replaces scipy.linalg.sqrtm,
    stpy/helpers/helper.py:112 and positive_embedding.py:69-71)."""
    w, V = jnp.linalg.eigh(A)
    w = jnp.clip(w, 0.0, None)
    return (V * jnp.sqrt(w)) @ V.T


def logdet(L: jnp.ndarray) -> jnp.ndarray:
    """log|A| from a Cholesky factor L of A."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def finite_difference_gradient(f, x, eps=1e-6):
    """Central finite differences (parity: stpy/helpers/helper.py:380-410)."""
    x = np.asarray(x, dtype=float).ravel()
    g = np.zeros_like(x)
    for i in range(x.size):
        e = np.zeros_like(x)
        e[i] = eps
        g[i] = (float(f(x + e)) - float(f(x - e))) / (2 * eps)
    return g


def complex_step_gradient(f, x, eps=1e-20):
    """Complex-step differentiation (exact to machine precision for
    holomorphic f; parity helper.py:380)."""
    x = np.asarray(x, dtype=float).ravel()
    g = np.zeros_like(x)
    for i in range(x.size):
        e = np.zeros(x.size, dtype=complex)
        e[i] = 1j * eps
        g[i] = np.imag(f(x.astype(complex) + e)) / eps
    return g


def batch_jacobian(f, x):
    """Per-row jacobians of f: (n, d_in) -> (n, d_out, d_in) via vmap."""
    import jax

    return jax.vmap(jax.jacobian(f))(x)


def batch_hessian(f, x):
    import jax

    return jax.vmap(jax.hessian(f))(x)
