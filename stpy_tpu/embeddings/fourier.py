"""Fourier-feature embeddings: random (RFF/ORF/Halton-QMC) and deterministic
quadrature (QFF: Gauss-Legendre cot-transform, Hermite, trapezoidal,
Clenshaw-Curtis, Matérn-specific, periodic, lattice).

Parity: stpy/embeddings/embedding.py:139 (RFFEmbedding), :251
(QuadratureEmbedding), :507-700 (variants). Node/weight tables are host-side
numpy (design-time, once); `embed` is a single fused (n,d)x(d,m) matmul +
trig on device — the MXU path. Feature layout everywhere:
    Φ(x) = √κ · [√w ⊙ cos(Wx); √w ⊙ sin(Wx)]      (m/2 frequencies)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.embeddings.base import Embedding, box_trig_integrals
from stpy_tpu.utils.helper import cartesian


def _halton(n: int, d: int) -> np.ndarray:
    """Halton low-discrepancy sequence in [0,1)^d (host-side)."""
    def vdc(n, base):
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

    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]
    assert d <= len(primes)
    return np.stack([vdc(n, primes[j]) for j in range(d)], axis=1)


def _gauss_inverse_cdf(u: np.ndarray) -> np.ndarray:
    """Acklam's rational approximation of the normal inverse CDF (host-side;
    avoids a scipy dependency)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    u = np.clip(u, 1e-12, 1 - 1e-12)
    out = np.empty_like(u)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = u < plow
    hi = u > phigh
    mid = ~(lo | hi)
    q = np.sqrt(-2 * np.log(u[lo]))
    out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    q = u[mid] - 0.5
    r = q * q
    out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
    q = np.sqrt(-2 * np.log(1 - u[hi]))
    out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    return out


def _chi_sample(df: int, size: int, rng) -> np.ndarray:
    return np.sqrt(rng.chisquare(df, size=size))


class _TrigEmbedding(Embedding):
    """Shared machinery for [cos; sin] feature maps with per-frequency
    weights. Subclasses set self.W (m/2, d) and self.weights (m/2,)."""

    W: jnp.ndarray
    weights: jnp.ndarray

    def _feature_scales(self):
        return jnp.sqrt(self.weights) * np.sqrt(self.kappa)

    def _build_embed(self):
        W = self.W
        sw = self._feature_scales()

        @jax.jit
        def _embed(x):
            q = x @ W.T  # (n, m/2) — the MXU matmul
            return jnp.concatenate([sw * jnp.cos(q), sw * jnp.sin(q)], axis=1)

        self._embed_jit = _embed

    def embed(self, x):
        x = jnp.asarray(x, default_dtype()).reshape(-1, self.d)
        return self._embed_jit(x)

    # analytic feature derivatives (parity: embedding.py:268-304)
    def derivative_1(self, x):
        """dΦ/dx: (n, m, d)."""
        x = jnp.asarray(x, default_dtype()).reshape(-1, self.d)
        q = x @ self.W.T
        sw = self._feature_scales()
        dcos = -(sw * jnp.sin(q))[:, :, None] * self.W[None, :, :]
        dsin = (sw * jnp.cos(q))[:, :, None] * self.W[None, :, :]
        return jnp.concatenate([dcos, dsin], axis=1)

    def derivative_2(self, x):
        """d²Φ/dx²: (n, m, d, d)."""
        x = jnp.asarray(x, default_dtype()).reshape(-1, self.d)
        q = x @ self.W.T
        sw = self._feature_scales()
        ww = self.W[:, :, None] * self.W[:, None, :]  # (m/2, d, d)
        d2cos = -(sw * jnp.cos(q))[:, :, None, None] * ww[None]
        d2sin = -(sw * jnp.sin(q))[:, :, None, None] * ww[None]
        return jnp.concatenate([d2cos, d2sin], axis=1)

    def product_integral(self, S):
        """Ψ_ij = ∫_S Φ_i Φ_j dx via product-to-sum identities — the whole
        (m, m) matrix from two vectorized box integrals (replaces the O(m²)
        Python double loop at embedding.py:306-362)."""
        W = self.W
        h = W.shape[0]
        Wm = W[:, None, :] - W[None, :, :]  # (h, h, d) freq differences
        Wp = W[:, None, :] + W[None, :, :]
        Icm, Ism = box_trig_integrals(Wm.reshape(h * h, -1), S.bounds)
        Icp, Isp = box_trig_integrals(Wp.reshape(h * h, -1), S.bounds)
        Icm, Ism = Icm.reshape(h, h), Ism.reshape(h, h)
        Icp, Isp = Icp.reshape(h, h), Isp.reshape(h, h)
        cc = 0.5 * (Icm + Icp)          # cos_i cos_j = ½[cos(Δ)+cos(Σ)]
        ss = 0.5 * (Icm - Icp)          # sin_i sin_j = ½[cos(Δ)-cos(Σ)]
        sc = 0.5 * (Isp + Ism)          # sin_i cos_j = ½[sin(Σ)+sin(Δ)]
        cs = 0.5 * (Isp - Ism)          # cos_i sin_j = ½[sin(Σ)-sin(Δ)]
        sw = self._feature_scales()
        outer = sw[:, None] * sw[None, :]
        top = jnp.concatenate([outer * cc, outer * cs], axis=1)
        bot = jnp.concatenate([outer * sc, outer * ss], axis=1)
        return jnp.concatenate([top, bot], axis=0)


class RFFEmbedding(_TrigEmbedding):
    """Random Fourier features (paired cos/sin over m/2 frequencies) with
    samplers for SE/Laplace spectral densities, QMC-Halton variant, and
    orthogonal random features (QR + chi scaling).
    Parity: stpy/embeddings/embedding.py:139-241."""

    def __init__(self, biased=False, seed=0, **kwargs):
        super().__init__(**kwargs)
        self.biased = biased
        self.seed = seed
        self.sample()

    def sample(self):
        rng = np.random.default_rng(self.seed)
        h, d = self.m // 2, self.d
        if self.approx == "rff":
            if self.kernel == "squared_exponential":
                W = rng.standard_normal((h, d)) / self.gamma
            elif self.kernel == "laplace":
                # Cauchy spectral density
                W = np.tan(np.pi * (rng.uniform(size=(h, d)) - 0.5)) / self.gamma
            else:
                raise AssertionError(f"RFF sampler for {self.kernel} missing")
        elif self.approx == "halton":
            u = _halton(h, d)
            if self.kernel == "squared_exponential":
                W = _gauss_inverse_cdf(u) / self.gamma
            elif self.kernel == "laplace":
                W = np.tan(np.pi * u - np.pi / 2) / self.gamma
            else:
                raise AssertionError("Halton sampler needs inverse CDF")
        elif self.approx == "orf":
            # orthogonal random features: QR of Gaussian + chi row norms
            blocks = []
            remaining = h
            while remaining > 0:
                G = rng.standard_normal((d, d))
                Q, _ = np.linalg.qr(G)
                S = _chi_sample(d, d, rng)
                blocks.append(S[:, None] * Q)
                remaining -= d
            W = np.concatenate(blocks, axis=0)[:h] / self.gamma
        else:
            raise AssertionError(f"approx={self.approx} unknown")
        self.W = jnp.asarray(W, default_dtype())
        self.weights = jnp.full((h,), 2.0 / self.m, default_dtype())
        self._build_embed()


class QuadratureEmbedding(_TrigEmbedding):
    """Deterministic quadrature Fourier features: tensor grid of 1-D rules
    mapped through the cot-transform and the kernel's spectral density.
    Parity: stpy/embeddings/embedding.py:251-448."""

    def __init__(self, scale=1.0, **kwargs):
        super().__init__(**kwargs)
        self.scale = scale
        self.compute()

    # spectral densities (parity: embedding.py:396-423)
    def transform(self):
        if self.kernel == "squared_exponential":
            return lambda om: (
                np.exp(-np.sum(om**2, axis=1) / 2 * self.gamma**2)
                * (self.gamma / np.sqrt(2 * np.pi)) * (np.pi / 2)
            )
        if self.kernel == "laplace":
            return lambda om: (
                np.prod(1.0 / (self.gamma**2 * om**2 + 1.0), axis=1)
                * (self.gamma / 2.0)
            )
        if self.kernel == "modified_matern":
            consts = {2: 1.0, 3: 4.0 / 3, 4: 8.0 / 5}
            nu = int(self.nu)
            return lambda om: (
                np.prod(1.0 / (self.gamma**2 * om**2 + 1.0) ** nu, axis=1)
                * self.gamma * consts[nu]
            )
        raise AssertionError(f"no spectral density for {self.kernel}")

    def nodesAndWeights(self, q):
        """Gauss-Legendre on (0,1) → cot transform to (0, ∞), weights x
        spectral density (parity: embedding.py:425-448)."""
        om, w = np.polynomial.legendre.leggauss(2 * q)
        om, w = om[q:], 2 * w[q:]
        om = (om + 1.0) / 2.0 * np.pi
        sine_scale = 1.0 / np.sin(om) ** 2
        nodes = self.scale / np.tan(om)
        prob = self.transform()
        weights = self.scale * sine_scale * w * prob(nodes.reshape(-1, 1))
        return nodes, weights

    def compute(self, complexity_reorder=True):
        """Tensorize the 1-D rule to d dims.

        NOTE — fixed vs the reference: for d > 1 the spectral integral
        ∫ p(ω) cos(ωᵀδ) dω needs the frequency grid symmetrized over sign
        patterns (cos(ωᵀδ) does not factorize over dims). The reference keeps
        only the positive orthant (embedding.py:364-394), which biases the
        2-D kernel approximation by O(1) (its own 2-D Hermite QFF at m=512
        has max Gram error ≈ 0.39). Here each positive-orthant node is
        replicated over the 2^{d-1} half-space sign patterns (first
        coordinate fixed positive; cos is even) with weights / 2^{d-1},
        which restores the exact tensor-product identity
        E_s ∏_j cos(ω_j δ_j) — and machine-precision kernel approximation."""
        n_signs = 2 ** (self.d - 1)
        budget = self.m // (2 * n_signs)
        self.q = max(int(np.power(budget, 1.0 / self.d)), 1)
        while (self.q + 1) ** self.d <= budget:
            self.q += 1
        nodes, weights = self.nodesAndWeights(self.q)
        if complexity_reorder:
            order = np.argsort(np.abs(nodes))
            nodes, weights = nodes[order], weights[order]
        W = cartesian([nodes] * self.d)           # (q^d, d), positive orthant
        wprod = np.prod(cartesian([weights] * self.d), axis=1)
        if self.d > 1:
            signs = cartesian([[1.0]] + [[-1.0, 1.0]] * (self.d - 1))
            W = (W[:, None, :] * signs[None, :, :]).reshape(-1, self.d)
            wprod = np.repeat(wprod / n_signs, n_signs)
        base = W.shape[0]
        self.m = 2 * base
        self.W = jnp.asarray(W, default_dtype())
        self.weights = jnp.asarray(wprod, default_dtype())
        self._build_embed()


class TrapezoidalEmbedding(QuadratureEmbedding):
    """Equispaced trapezoid rule in spectral domain (embedding.py:507)."""

    def nodesAndWeights(self, q):
        prob = self.transform()
        h = np.sqrt(np.pi / q) / self.gamma**2
        nodes = np.linspace(-(q // 2), q // 2, q) * h
        weights = h * prob(nodes.reshape(-1, 1)) * (2 / np.pi)
        return nodes, weights


class ClenshawCurtisEmbedding(QuadratureEmbedding):
    """Clenshaw-Curtis nodes through the cot transform (embedding.py:529)."""

    def nodesAndWeights(self, q):
        L = 1.0 / self.gamma
        prob = self.transform()
        t = np.pi * np.linspace(0, q + 1, q + 2)[1:-1] / (q + 2)
        nodes = L / np.tan(t)
        weights = L * (np.pi / (q + 2)) / np.sin(t) ** 2
        weights = weights * prob(nodes.reshape(-1, 1)) * (2.0 / np.pi)
        return nodes, weights


class HermiteEmbedding(QuadratureEmbedding):
    """Gauss-Hermite QFF — the workhorse for the SE kernel
    (embedding.py:573; NeurIPS-18 QFF construction)."""

    def __init__(self, ones=False, cosine=False, **kwargs):
        self.ones = ones
        kwargs["cosine"] = cosine
        super().__init__(**kwargs)
        if self.kernel != "squared_exponential":
            raise AssertionError(
                "Hermite Embedding is allowed only with Squared Exponential Kernel"
            )

    def nodesAndWeights(self, q):
        nodes, weights = np.polynomial.hermite.hermgauss(2 * q)
        nodes, weights = nodes[q:], 2 * weights[q:]
        if self.ones:
            weights = np.ones(q)
        nodes = np.sqrt(2) * nodes / self.gamma
        weights = weights / np.sqrt(np.pi)
        return nodes, weights


class OverCompleteHermiteEmbedding(HermiteEmbedding):
    """Full (two-sided) Hermite rule (embedding.py:605)."""

    def nodesAndWeights(self, q):
        nodes, weights = np.polynomial.hermite.hermgauss(q)
        nodes = np.sqrt(2) * nodes / self.gamma
        weights = weights / np.sqrt(np.pi)
        return nodes, weights


class MaternEmbedding(QuadratureEmbedding):
    """Hermite nodes against Matérn/Laplace spectral density
    (embedding.py:623)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if self.kernel not in ("modified_matern", "laplace"):
            raise AssertionError(
                "Matern Embedding is allowed only with Matern Kernel"
            )

    def nodesAndWeights(self, q):
        nodes, weights = np.polynomial.hermite.hermgauss(q)
        nodes = np.sqrt(2) * nodes / self.gamma
        weights = weights / np.sqrt(np.pi)
        return nodes, weights


class QuadPeriodicEmbedding(QuadratureEmbedding):
    """Periodic lattice of frequencies (embedding.py:646)."""

    def nodesAndWeights(self, q):
        weights = np.ones(q) * self.scale * 2 / (q + 1)
        om = (np.arange(q) + 1) * (np.pi / (q + 1))
        sine_scale = 1.0 / np.sin(om) ** 2
        nodes = self.scale / np.tan(om)
        prob = self.transform()
        weights = self.scale * sine_scale * weights * prob(nodes.reshape(-1, 1))
        return nodes, weights


class KLEmbedding(QuadratureEmbedding):
    """Karhunen-Loève-style expansion (embedding.py:672)."""


class LatticeEmbedding(QuadratureEmbedding):
    """Natural-number frequency lattice (embedding.py:681)."""

    def nodesAndWeights(self, q):
        nodes = np.sqrt(2) * np.arange(1, q + 1) / self.gamma
        weights = np.ones(q) / (2 * q)
        return nodes, weights
