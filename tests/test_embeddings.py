import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import BorelSet
from stpy_tpu.embeddings import (
    AdditiveEmbeddings,
    BernsteinEmbedding,
    ConcatEmbedding,
    HermiteEmbedding,
    NystromFeatures,
    PolynomialEmbedding,
    ChebyschevEmbedding,
    RFFEmbedding,
    TriangleEmbedding,
    FaberSchauderEmbedding,
    QuadratureEmbedding,
)
from stpy_tpu.kernels import KernelFunction


def _np_se(x, y, gamma):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * d2 / gamma**2)


def test_hermite_qff_kernel_approximation():
    """QFF should approximate the SE Gram to high accuracy (NeurIPS-18)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (30, 1))
    for m, tol in [(32, 1e-5), (64, 1e-8)]:
        emb = HermiteEmbedding(gamma=0.5, m=m, d=1)
        Phi = np.asarray(emb.embed(x))
        K = Phi @ Phi.T
        assert np.abs(K - _np_se(x, x, 0.5)).max() < tol


def test_hermite_qff_2d():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (20, 2))
    emb = HermiteEmbedding(gamma=0.7, m=512, d=2)
    Phi = np.asarray(emb.embed(x))
    K = Phi @ Phi.T
    assert np.abs(K - _np_se(x, x, 0.7)).max() < 1e-6


def test_rff_kernel_approximation_statistical():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (25, 2))
    emb = RFFEmbedding(gamma=0.6, m=4096, d=2, approx="rff", seed=3)
    Phi = np.asarray(emb.embed(x))
    K = Phi @ Phi.T
    assert np.abs(K - _np_se(x, x, 0.6)).max() < 0.1


def test_orf_and_halton_variants():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (15, 2))
    for approx in ["orf", "halton"]:
        emb = RFFEmbedding(gamma=0.8, m=2048, d=2, approx=approx)
        K = np.asarray(emb.embed(x) @ emb.embed(x).T)
        assert np.abs(K - _np_se(x, x, 0.8)).max() < 0.15, approx


def test_fourier_integral_matches_quadrature():
    """integral(S) must equal numerically integrated embed over S."""
    emb = HermiteEmbedding(gamma=0.5, m=32, d=1)
    S = BorelSet(1, [[-0.3, 0.7]])
    psi = np.asarray(emb.integral(S))
    w, nodes = S.return_legendre_discretization(64)
    ref = np.asarray(w @ emb.embed(nodes))
    assert np.abs(psi - ref).max() < 1e-8


def test_fourier_integral_2d():
    emb = QuadratureEmbedding(gamma=0.5, m=128, d=2)
    S = BorelSet(2, [[-0.5, 0.5], [-0.2, 0.8]])
    psi = np.asarray(emb.integral(S))
    w, nodes = S.return_legendre_discretization(40)
    ref = np.asarray(w @ emb.embed(nodes))
    assert np.abs(psi - ref).max() < 1e-7


def test_product_integral_matches_quadrature():
    emb = HermiteEmbedding(gamma=0.5, m=16, d=1)
    S = BorelSet(1, [[-0.4, 0.6]])
    Psi = np.asarray(emb.product_integral(S))
    w, nodes = S.return_legendre_discretization(100)
    Phi = np.asarray(emb.embed(nodes))
    ref = (Phi * np.asarray(w)[:, None]).T @ Phi
    assert np.abs(Psi - ref).max() < 1e-8


def test_derivatives_match_autodiff():
    emb = HermiteEmbedding(gamma=0.5, m=16, d=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 2)))
    D1 = emb.derivative_1(x)
    ref = jax.vmap(jax.jacobian(lambda p: emb.embed(p[None, :])[0]))(x)
    assert np.allclose(D1, ref, atol=1e-8)
    D2 = emb.derivative_2(x)
    ref2 = jax.vmap(jax.hessian(lambda p: emb.embed(p[None, :])[0]))(x)
    assert np.allclose(D2, ref2, atol=1e-7)


def test_triangle_embedding_partition_and_integral():
    emb = TriangleEmbedding(d=1, m=16)
    x = np.linspace(-1, 1, 100)[:, None]
    Phi = np.asarray(emb.embed_internal(x))
    # hat functions form a partition of unity
    assert np.allclose(Phi.sum(axis=1), 1.0, atol=1e-10)
    # integral parity with dense trapezoid (GL converges slowly on the
    # piecewise-linear kinks; the closed form is exact)
    S = BorelSet(1, [[-0.55, 0.3]])
    psi = np.asarray(emb.integral(S))
    grid = np.linspace(-0.55, 0.3, 20001)[:, None]
    vals = np.asarray(emb.embed(grid))
    ref = np.trapezoid(vals, grid[:, 0], axis=0)
    assert np.abs(psi - ref).max() < 1e-7


def test_triangle_2d_integral():
    emb = TriangleEmbedding(d=2, m=6)
    S = BorelSet(2, [[-0.5, 0.5], [-1.0, 0.0]])
    psi = np.asarray(emb.integral(S))
    # dense separable trapezoid reference (kinked integrand, GL unsuitable)
    gx = np.linspace(-0.5, 0.5, 2001)
    gy = np.linspace(-1.0, 0.0, 2001)
    Bx = np.asarray(emb._basis_matrix_1d(jnp.asarray(gx)))  # (n, m)
    By = np.asarray(emb._basis_matrix_1d(jnp.asarray(gy)))
    ix = np.trapezoid(Bx, gx, axis=0)
    iy = np.trapezoid(By, gy, axis=0)
    ref = (ix[:, None] * iy[None, :]).reshape(-1)
    assert np.abs(psi - ref).max() < 1e-7


def test_triangle_with_kernel_reweighting():
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    emb = TriangleEmbedding(d=1, m=12, kernel_object=k)
    x = np.linspace(-1, 1, 50)[:, None]
    Phi = np.asarray(emb.embed(x))
    assert Phi.shape == (50, 12)
    assert np.all(np.isfinite(Phi))


def test_faber_schauder():
    emb = FaberSchauderEmbedding(d=1, m=8)
    x = np.linspace(-1, 1, 64)[:, None]
    Phi = np.asarray(emb.embed_internal(x))
    assert Phi.shape == (64, 8)
    assert np.allclose(Phi[:, 0], 1.0)
    S = BorelSet(1, [[-0.6, 0.2]])
    psi = np.asarray(emb.integral(S))
    grid = np.linspace(-0.6, 0.2, 20001)[:, None]
    ref = np.trapezoid(np.asarray(emb.embed(grid)), grid[:, 0], axis=0)
    assert np.abs(psi - ref).max() < 1e-7
    assert emb.hierarchical_mask().shape == (8,)


def test_bernstein_partition_and_integral():
    emb = BernsteinEmbedding(d=1, m=8)
    x = np.linspace(-1, 1, 60)[:, None]
    Phi = np.asarray(emb.embed_internal(x))
    assert np.allclose(Phi.sum(axis=1), 1.0, atol=1e-9)
    assert np.all(Phi >= -1e-12)
    S = BorelSet(1, [[-0.8, 0.5]])
    psi = np.asarray(emb.integral(S))
    w, nodes = S.return_legendre_discretization(100)
    ref = np.asarray(w @ emb.embed(nodes))
    assert np.abs(psi - ref).max() < 1e-9


def test_positive_fit_is_nonnegative():
    emb = TriangleEmbedding(d=1, m=24, b=0.0, B=1000.0)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (40, 1))
    y = np.abs(np.sin(3 * x)) + 0.01 * rng.standard_normal((40, 1))
    emb.fit(x, y)
    grid = np.linspace(-1, 1, 200)[:, None]
    vals = np.asarray(emb.mean(grid))
    assert vals.min() > -1e-6  # positivity constraint respected
    # and fits the data reasonably
    resid = np.abs(np.asarray(emb.mean(x)) - np.abs(np.sin(3 * x)))
    assert resid.mean() < 0.15


def test_polynomial_and_chebyshev():
    x = np.random.default_rng(0).uniform(-1, 1, (10, 2))
    emb = PolynomialEmbedding(d=2, p=3)
    Phi = np.asarray(emb.embed(x))
    assert Phi.shape[0] == 10 and Phi.shape[1] == emb.get_m()
    # contains x1*x2 feature: find exponent (1,1)
    E = np.asarray(emb.exponents)
    idx = np.where((E == [1, 1]).all(axis=1))[0][0]
    assert np.allclose(Phi[:, idx], x[:, 0] * x[:, 1])

    ch = ChebyschevEmbedding(d=1, p=4)
    t = np.linspace(-1, 1, 20)[:, None]
    P = np.asarray(ch.embed(t))
    assert np.allclose(P[:, 2], 2 * t[:, 0] ** 2 - 1, atol=1e-10)


def test_concat_and_additive_combinators():
    e1 = HermiteEmbedding(gamma=0.5, m=16, d=1)
    e2 = HermiteEmbedding(gamma=1.0, m=16, d=1)
    cat = ConcatEmbedding([e1, e2])
    x = np.linspace(-1, 1, 9)[:, None]
    assert cat.embed(x).shape == (9, 32)

    add = AdditiveEmbeddings([e1, e2], groups=[[0], [1]])
    x2 = np.random.default_rng(0).uniform(-1, 1, (9, 2))
    Phi = np.asarray(add.embed(x2))
    assert Phi.shape == (9, 32)
    # first block only depends on dim 0
    x2b = x2.copy()
    x2b[:, 1] = 0.123
    Phib = np.asarray(add.embed(x2b))
    assert np.allclose(Phi[:, :16], Phib[:, :16])


def test_nystrom_uniform_and_svd():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (80, 1))
    y = np.sin(3 * x)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    for approx in ["svd", "uniform", "leverage"]:
        nf = NystromFeatures(k, m=30, approx=approx, s=0.1)
        nf.fit_gp(x, y)
        Phi = np.asarray(nf.embed(x))
        K_approx = Phi @ Phi.T
        K_true = _np_se(x, x, 0.5)
        # svd with m=30 of n=80 should be very accurate; sampling approx less
        tol = 1e-4 if approx == "svd" else 0.6
        assert np.abs(K_approx - K_true).max() < tol, approx


def test_nystrom_mean_std_reasonable():
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (60, 1))
    y = np.sin(3 * x) + 0.05 * rng.standard_normal((60, 1))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    nf = NystromFeatures(k, m=40, approx="svd", s=0.05)
    nf.fit_gp(x, y)
    xt = np.linspace(-1, 1, 50)[:, None]
    mu, std = nf.mean_std(xt)
    assert np.abs(np.asarray(mu)[:, 0] - np.sin(3 * xt[:, 0])).mean() < 0.1
