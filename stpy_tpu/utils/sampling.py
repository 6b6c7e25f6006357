"""Sampling helpers: rejection sampling, Halton QMC, sphere sampling, and
balanced duplicate-free dataset splits.

Parity: stpy/helpers/abitrary_sampling.py (:8 sphere, :16 rejection,
:52-85 Halton/QMC, :94-211 balanced splits).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
           61, 67, 71]


def sample_uniform_sphere(key, n, d, radius=1.0):
    z = jax.random.normal(key, (n, d), default_dtype())
    return radius * z / jnp.linalg.norm(z, axis=1, keepdims=True)


def rejection_sampling(pdf, size=(1, 1), bound=None, proposal_range=10.0,
                       seed=0, max_tries=100000):
    """Host-side rejection sampler from an unnormalized pdf over a box
    [-R, R]^d (design-time utility)."""
    n, d = size
    rng = np.random.default_rng(seed)
    if bound is None:
        probe = rng.uniform(-proposal_range, proposal_range, (4096, d))
        bound = float(np.max(pdf(probe))) * 1.5
    out = []
    tries = 0
    while len(out) < n and tries < max_tries:
        x = rng.uniform(-proposal_range, proposal_range, (n, d))
        u = rng.uniform(0, bound, n)
        acc = u < np.asarray(pdf(x)).ravel()
        out.extend(list(x[acc]))
        tries += n
    return np.asarray(out[:n])


def vdc(n, base=2):
    """Van der Corput sequence (abitrary_sampling.py:52)."""
    seq = np.zeros(n)
    for i in range(n):
        q, denom = 0.0, 1.0
        k = i + 1
        while k > 0:
            denom *= base
            k, rem = divmod(k, base)
            q += rem / denom
        seq[i] = q
    return seq


def halton_sequence(size, dim):
    assert dim <= len(_PRIMES)
    return np.stack([vdc(size, _PRIMES[j]) for j in range(dim)], axis=1)


def sample_qmc_halton(inverse_cdf, size=(1, 1)):
    u = halton_sequence(size[0], size[1])
    return inverse_cdf(u)


def sample_bounded(key, bounds, n=1):
    bounds = jnp.asarray(bounds, default_dtype())
    u = jax.random.uniform(key, (n, bounds.shape[0]), default_dtype())
    return bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])


def randomly_split_set_without_duplicates(x, sizes, seed=0):
    """Split rows of x into disjoint index sets of the given sizes such that
    no duplicate row is split across sets (abitrary_sampling.py:126)."""
    x_np = np.asarray(x)
    _, inverse = np.unique(x_np, axis=0, return_inverse=True)
    rng = np.random.default_rng(seed)
    group_ids = np.unique(inverse)
    rng.shuffle(group_ids)
    sets = [[] for _ in sizes]
    cursor = 0
    for gid in group_ids:
        idx = np.where(inverse == gid)[0]
        while cursor < len(sizes) and len(sets[cursor]) >= sizes[cursor]:
            cursor += 1
        if cursor >= len(sizes):
            break
        sets[cursor].extend(idx.tolist())
    return [np.asarray(s, dtype=int) for s in sets]


def randomly_split_set_without_duplicates_balanced(x, k, seed=0):
    """k roughly equal splits keeping duplicates together
    (abitrary_sampling.py:94)."""
    n = np.asarray(x).shape[0]
    sizes = [n // k] * k
    return randomly_split_set_without_duplicates(x, sizes, seed=seed)
