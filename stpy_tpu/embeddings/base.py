"""Embedding base: finite-basis approximations Φ with k(x,y) ≈ Φ(x)ᵀΦ(y).

Parity: stpy/embeddings/embedding.py:53 (Embedding base: embed/get_m/
integral). The Fourier box integral here replaces the reference's per-
frequency Python loop + recursive trig expansion (embedding.py:120-137,
quadrature_helper.py:8-192) with one vectorized complex-product formula:

    ∫_box exp(i ωᵀx) dx = Π_j (e^{i ω_j b_j} - e^{i ω_j a_j}) / (i ω_j)

so ∫ cos = Re(Π), ∫ sin = Im(Π), for ALL m frequencies in one jnp expression.
"""

from __future__ import annotations

import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype


def _complex_dtype():
    return jnp.complex128 if default_dtype() == jnp.float64 else jnp.complex64


def box_trig_integrals(W: jnp.ndarray, bounds) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(∫_S cos(ω_kᵀx) dx, ∫_S sin(ω_kᵀx) dx) for all rows ω_k of W (K, d)
    over the box S = Π_j [a_j, b_j]. Returns two (K,) arrays.

    Zero-frequency coordinates take the limit (b_j - a_j)."""
    bounds = as_array(bounds).reshape(-1, 2)
    a, b = bounds[:, 0], bounds[:, 1]
    cd = _complex_dtype()
    iw = 1j * W.astype(cd)  # (K, d)
    num = jnp.exp(iw * b) - jnp.exp(iw * a)  # (K, d)
    small = jnp.abs(W) < 1e-12
    terms = jnp.where(small, (b - a).astype(cd), num / jnp.where(small, 1.0, iw))
    prod = jnp.prod(terms, axis=1)
    return jnp.real(prod).astype(W.dtype), jnp.imag(prod).astype(W.dtype)


class Embedding:
    """Base class; subclasses define `embed(x) -> (n, m)`."""

    def __init__(
        self, gamma=0.1, nu=0.5, m=100, d=1, diameter=1.0, groups=None,
        kappa=1.0, kernel="squared_exponential", cosine=False, approx="rff",
        **kwargs,
    ):
        self.gamma = float(gamma)
        self.m = int(m)
        self.d = int(d)
        self.nu = nu
        self.kappa = kappa
        self.cosine = cosine
        self.diameter = diameter
        self.groups = groups
        self.kernel = kernel
        self.approx = approx
        self.gradient_avail = 0
        if self.m % 2 == 1:
            raise AssertionError("Number of random features has to be even.")

    def embed(self, x):
        raise AttributeError("Only derived classes can call this method.")

    def get_m(self) -> int:
        return self.m

    # Fourier-type subclasses store (W, weights); integral is then exact.
    def integral(self, S) -> jnp.ndarray:
        """∫_S Φ_i(x) dx for every basis index i — exact closed form for
        trig features (includes the √weight·√kappa scaling of `embed`, which
        the reference's base-class version drops, embedding.py:120)."""
        W = self.W
        Icos, Isin = box_trig_integrals(W, S.bounds)
        sw = self._feature_scales()
        return jnp.concatenate([sw * Icos, sw * Isin])

    def _feature_scales(self):
        raise AttributeError("Only derived classes can call this method.")
