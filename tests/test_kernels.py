import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.kernels import KernelFunction, functions as F
from stpy_tpu.ops.pallas_gram import _gram_jnp, _gram_pallas


def _np_se(x, y, gamma, kappa=1.0):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return kappa * np.exp(-0.5 * d2 / gamma**2)


@pytest.fixture
def xy():
    rng = np.random.default_rng(0)
    return rng.standard_normal((17, 3)), rng.standard_normal((11, 3))


def test_se_matches_dense_formula(xy):
    x, y = xy
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.7, d=3)
    K = k.cross(x, y)
    assert np.allclose(K, _np_se(x, y, 0.7), atol=1e-10)
    # reference convention is transposed
    assert np.allclose(k.kernel(x, y), _np_se(x, y, 0.7).T, atol=1e-10)


def test_ard_kernel(xy):
    x, y = xy
    g = np.array([0.5, 1.0, 2.0])
    k = KernelFunction(kernel_name="ard", d=3, ard_gamma=g)
    K = k.cross(x, y)
    d2 = (((x / g)[:, None, :] - (y / g)[None, :, :]) ** 2).sum(-1)
    assert np.allclose(K, np.exp(-0.5 * d2), atol=1e-10)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_kernels(xy, nu):
    x, y = xy
    k = KernelFunction(kernel_name="matern", gamma=0.9, nu=nu, d=3)
    K = np.asarray(k.cross(x, y))
    r = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1)) / 0.9
    if nu == 0.5:
        ref = np.exp(-r)
    elif nu == 1.5:
        ref = (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    else:
        ref = (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)
    assert np.allclose(K, ref, atol=1e-7)


def test_laplace_linear_poly(xy):
    x, y = xy
    kl = KernelFunction(kernel_name="laplace", gamma=1.3, d=3)
    ref = np.exp(-np.abs(x[:, None] - y[None]).sum(-1) / 1.3**2)
    assert np.allclose(kl.cross(x, y), ref, atol=1e-10)

    klin = KernelFunction(kernel_name="linear", d=3, kappa=2.0, offset=0.5)
    assert np.allclose(klin.cross(x, y), 2.0 * x @ y.T + 0.5, atol=1e-10)

    kp = KernelFunction(kernel_name="polynomial", d=3, power=3)
    assert np.allclose(kp.cross(x, y), (x @ y.T + 1) ** 3, atol=1e-8)


def test_kernel_algebra_sum_product(xy):
    x, y = xy
    k1 = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=3)
    k2 = KernelFunction(kernel_name="linear", d=3)
    k = k1 + k2
    ref = _np_se(x, y, 0.5) + x @ y.T
    assert np.allclose(k.cross(x, y), ref, atol=1e-9)

    k1 = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=3)
    k2 = KernelFunction(kernel_name="polynomial", d=3, power=2)
    kprod = k1 * k2
    ref = _np_se(x, y, 0.5) * (x @ y.T + 1) ** 2
    assert np.allclose(kprod.cross(x, y), ref, atol=1e-8)


def test_group_restriction(xy):
    x, y = xy
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.8, d=3,
                       group=[0, 2])
    ref = _np_se(x[:, [0, 2]], y[:, [0, 2]], 0.8)
    assert np.allclose(k.cross(x, y), ref, atol=1e-10)


def test_additive_groups_ard(xy):
    x, y = xy
    groups = [[0], [1, 2]]
    k = KernelFunction(kernel_name="ard", d=3, groups=groups)
    K = np.asarray(k.cross(x, y))
    ref = 0.5 * (
        _np_se(x[:, [0]], y[:, [0]], 1.0) + _np_se(x[:, 1:], y[:, 1:], 1.0)
    )
    assert np.allclose(K, ref, atol=1e-10)


def test_step_wiener_vectorized(xy):
    x = np.abs(xy[0])
    y = np.abs(xy[1])
    kw = KernelFunction(kernel_name="wiener", d=3)
    ref = np.minimum(x[:, None], y[None]).sum(-1)
    assert np.allclose(kw.cross(x, y), ref, atol=1e-10)

    ks = KernelFunction(kernel_name="step", d=3)
    ref2 = (x[:, None] + y[None] - np.abs(x[:, None] - y[None])).sum(-1)
    assert np.allclose(ks.cross(x, y), ref2, atol=1e-10)


def test_spectral_kernel():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 1))
    y = rng.standard_normal((4, 1))
    freq = rng.standard_normal((7, 1))
    k = KernelFunction(kernel_name="spectral", d=1, freq=freq)
    K = np.asarray(k.cross(x, y))
    ref = np.mean(np.cos((x[:, None, :] - y[None, :, :]) @ freq.T), axis=-1)
    assert np.allclose(K, ref, atol=1e-9)


def test_diag_matches_gram_diagonal(xy):
    x, _ = xy
    for name, kw in [
        ("squared_exponential", dict(gamma=0.7)),
        ("linear", dict(kappa=1.5)),
        ("matern", dict(gamma=1.1, nu=1.5)),
    ]:
        k = KernelFunction(kernel_name=name, d=3, **kw)
        dg = np.asarray(k.diag(x))
        G = np.asarray(k.gram(x))
        assert np.allclose(dg, np.diagonal(G), atol=1e-7), name


def test_gram_differentiable_wrt_gamma(xy):
    x, y = xy
    x, y = jnp.asarray(x), jnp.asarray(y)

    def loss(g):
        k = F.squared_exponential({"gamma": g, "kappa": 1.0}, x, y)
        return jnp.sum(k)

    g0 = jnp.asarray(0.7)
    grad = jax.grad(loss)(g0)
    eps = 1e-6
    fd = (loss(g0 + eps) - loss(g0 - eps)) / (2 * eps)
    assert np.allclose(grad, fd, rtol=1e-4)


def test_pallas_gram_custom_vjp_matches_autodiff(xy):
    """The custom_vjp backward (used when forward is Pallas) must equal
    autodiff through the jnp path."""
    from stpy_tpu.ops.pallas_gram import gram_se

    x, y = jnp.asarray(xy[0]), jnp.asarray(xy[1])

    def loss_custom(g, kap):
        return jnp.sum(gram_se(x, y, g, kap) ** 2)

    def loss_ref(g, kap):
        return jnp.sum(
            (kap * jnp.exp(-0.5 * F.sq_dist(x / g, y / g))) ** 2
        )

    g0, k0 = jnp.asarray(0.8), jnp.asarray(1.3)
    ga, ka = jax.grad(loss_custom, argnums=(0, 1))(g0, k0)
    gb, kb = jax.grad(loss_ref, argnums=(0, 1))(g0, k0)
    assert np.allclose(ga, gb, rtol=1e-6)
    assert np.allclose(ka, kb, rtol=1e-6)

    # grads wrt inputs too
    dx_a = jax.grad(lambda xx: jnp.sum(gram_se(xx, y, g0, k0) ** 2))(x)
    dx_b = jax.grad(
        lambda xx: jnp.sum((k0 * jnp.exp(-0.5 * F.sq_dist(xx / g0, y / g0))) ** 2)
    )(x)
    assert np.allclose(dx_a, dx_b, rtol=1e-6, atol=1e-10)


def test_pallas_kernel_interpret_mode(xy):
    """Run the actual Pallas kernel in interpreter mode on CPU and compare
    with the dense jnp path."""
    x, y = jnp.asarray(xy[0], jnp.float32), jnp.asarray(xy[1], jnp.float32)
    for family, nu in [("se", 1.0), ("matern", 1.5), ("matern", 2.5)]:
        out = _gram_pallas(
            x, y, 1.0, family=family, nu=nu, block_m=8, block_n=128,
            interpret=True,
        )
        ref = _gram_jnp(x, y, 1.0, family, nu)
        assert np.allclose(out, ref, atol=1e-5), family


def test_se_analytic_derivatives(xy):
    x, y = xy
    x, y = jnp.asarray(x), jnp.asarray(y)
    p = {"gamma": jnp.asarray(0.9), "kappa": 1.0}
    D1 = F.squared_exponential_derivative_1(p, x, y)
    # compare against autodiff: d/dy_j k(x_i, y_j)
    ref = jax.vmap(
        lambda yj: jax.jacobian(
            lambda yy: F.squared_exponential(p, x, yy[None, :])[:, 0]
        )(yj)
    )(y)  # (m, n, d)
    assert np.allclose(D1, jnp.transpose(ref, (1, 0, 2)), atol=1e-8)


def test_gibbs_and_covar_kernels(xy):
    x, y = xy
    # gibbs with constant lengthscale fn should reduce to SE with gamma_eff
    gfun = lambda a: 0.5 * jnp.ones((a.shape[0], 1))
    k = KernelFunction(kernel_name="gibbs", d=3, gamma_fun=gfun)
    K = np.asarray(k.cross(x, y))
    # lengthscale denominator = l(x)^2 + l(y)^2 = 0.5
    ref = np.exp(-0.5 * ((x[:, None] - y[None]) ** 2).sum(-1) / 0.5)
    assert np.allclose(K, ref, atol=1e-9)

    # full-covariance SE with C = (1/gamma) I equals isotropic SE
    C = np.eye(3) / 0.7
    kc = KernelFunction(kernel_name="full_covariance_se", d=3, cov=C)
    Kc = np.asarray(kc.cross(x, y))
    assert np.allclose(Kc, _np_se(x, y, 0.7), atol=1e-9)

    # full-covariance Matern
    km = KernelFunction(kernel_name="full_covariance_matern", d=3, cov=C,
                        nu=1.5)
    r = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1)) / 0.7
    refm = (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    assert np.allclose(km.cross(x, y), refm, atol=1e-6)


def test_modified_matern_and_tanh(xy):
    x, y = xy
    k = KernelFunction(kernel_name="modified_matern", gamma=0.8, nu=2, d=3)
    d = np.abs(x[:, None] - y[None]) / 0.8
    ref = np.prod((1 + d) * np.exp(-d), axis=-1)
    assert np.allclose(k.cross(x, y), ref, atol=1e-9)

    kt = KernelFunction(kernel_name="tanh", d=3)
    K = np.asarray(kt.cross(x, y))
    assert K.shape == (17, 11) and np.all(np.isfinite(K))


def test_per_group_additive_se(xy):
    x, y = xy
    groups = [[0], [1, 2]]
    k = KernelFunction(kernel_name="squared_exponential_per_group", d=3,
                       groups=groups, gamma=0.6)
    K = np.asarray(k.cross(x, y))
    ref = 0.5 * (
        _np_se(x[:, [0]], y[:, [0]], 0.6) + _np_se(x[:, 1:], y[:, 1:], 0.6)
    )
    assert np.allclose(K, ref, atol=1e-9)

    kp = KernelFunction(kernel_name="ard_per_group", d=3, groups=groups)
    K2 = np.asarray(kp.cross(x, y))
    ref2 = 0.5 * (
        _np_se(x[:, [0]], y[:, [0]], 1.0) + _np_se(x[:, 1:], y[:, 1:], 1.0)
    )
    assert np.allclose(K2, ref2, atol=1e-9)


def test_kernel_params_override_and_set(xy):
    x, y = xy
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=3,
                       kappa=2.0)
    # partial override keeps stored kappa
    K = np.asarray(k.cross(x, y, params_dict={"0": {"gamma": jnp.asarray(1.0)}}))
    assert np.allclose(K, 2.0 * _np_se(x, y, 1.0), atol=1e-9)
    k.set_params({"0": {"gamma": jnp.asarray(0.9)}})
    assert float(k.params_dict["0"]["gamma"]) == 0.9


def test_blocked_trisolve_in_gp_context():
    from stpy_tpu.linalg import tri_solve_blocked, safe_cholesky

    rng = np.random.default_rng(0)
    n, t = 520, 300
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    B = jnp.asarray(rng.standard_normal((n, t)))
    L = safe_cholesky(K).L
    X = tri_solve_blocked(L, B, nb=128)  # exercises the padding path
    ref = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    assert np.abs(np.asarray(X - ref)).max() < 1e-8


def test_random_map_kernel():
    from stpy_tpu.embeddings.random_nn import RandomMap

    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 2))
    y = rng.standard_normal((4, 2))
    rm = RandomMap(d=2, m=16, output=1, seed=0)
    k = KernelFunction(kernel_name="random_map", d=2, map=rm)
    K = np.asarray(k.cross(x, y))
    H1 = np.asarray(rm.map(jnp.asarray(x)))
    H2 = np.asarray(rm.map(jnp.asarray(y)))
    assert np.allclose(K, H1 @ H2.T, atol=1e-9)


def test_bessel_kv_matches_scipy():
    from scipy.special import kv as scipy_kv
    from stpy_tpu.kernels.functions import bessel_kv

    xs = np.logspace(-3, 1.4, 30)
    for nu in [0.3, 0.7, 1.2, 2.2, 3.3]:
        mine = np.asarray(bessel_kv(nu, jnp.asarray(xs)))
        ref = scipy_kv(nu, xs)
        rel = np.abs(mine - ref) / np.abs(ref)
        assert rel.max() < 1e-10, (nu, rel.max())


@pytest.mark.parametrize("nu", [0.8, 1.2, 3.3])
def test_general_nu_matern_matches_scipy(xy, nu):
    """General-ν Matérn kernel vs the scipy-based closed form the reference
    uses (stpy/kernels.py:852-858)."""
    import math
    from scipy.special import kv as scipy_kv

    x, y = xy
    gamma = 0.9
    k = KernelFunction(kernel_name="matern", gamma=gamma, nu=nu, d=3)
    K = np.asarray(k.cross(x, y))
    r = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1)) / gamma
    r = np.maximum(r, 1e-10)
    arg = np.sqrt(2 * nu) * r
    ref = (2 ** (1 - nu) / math.gamma(nu)) * arg**nu * scipy_kv(nu, arg)
    assert np.abs(K - ref).max() < 1e-9
    # GP with general-nu matern fits end to end
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xd = rng.uniform(-1, 1, (30, 1))
    yd = np.sin(3 * xd)
    gp = GaussianProcess(kernel_name="matern", gamma=0.4, nu=nu, s=0.05, d=1)
    gp.fit_gp(xd, yd)
    mu, std = gp.mean_std(xd)
    assert np.abs(np.asarray(mu) - yd).mean() < 0.05


def test_laplace_pallas_interpret_matches_jnp():
    from stpy_tpu.ops.pallas_gram import _gram_l1_pallas
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (70, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (50, 3)), jnp.float32)
    g = 0.8
    out = _gram_l1_pallas(x, y, 1.0 / (g * g), 1.3, block_m=8,
                          block_n=128, interpret=True)
    ref = 1.3 * jnp.exp(-F.manhattan_dist(x, y) / (g * g))
    assert np.allclose(out, ref, atol=1e-5)


def test_laplace_gram_custom_vjp_matches_autodiff():
    from stpy_tpu.ops.pallas_gram import gram_laplace
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (12, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (9, 2)))

    def loss_custom(g, k):
        return jnp.sum(gram_laplace(x, y, g, k) ** 2)

    def loss_ref(g, k):
        return jnp.sum((k * jnp.exp(-F.manhattan_dist(x, y) / g**2)) ** 2)

    gg, gk = jax.grad(loss_custom, argnums=(0, 1))(0.7, 1.2)
    rg, rk = jax.grad(loss_ref, argnums=(0, 1))(0.7, 1.2)
    assert np.allclose(gg, rg, rtol=1e-8)
    assert np.allclose(gk, rk, rtol=1e-8)
    # d/dx path (sign-based) against autodiff of the jnp formula
    dx = jax.grad(lambda xx: jnp.sum(gram_laplace(xx, y, 0.7, 1.2)))(x)
    dref = jax.grad(
        lambda xx: jnp.sum(1.2 * jnp.exp(-F.manhattan_dist(xx, y) / 0.49))
    )(x)
    assert np.allclose(dx, dref, rtol=1e-8)


def test_laplace_kernelfunction_uses_fast_path():
    k = KernelFunction(kernel_name="laplace", gamma=0.6, d=2, kappa=1.1)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-1, 1, (20, 2)))
    G = k.eval_params(k.params_dict, x, x)
    ref = 1.1 * jnp.exp(-F.manhattan_dist(x, x) / 0.36)
    assert np.allclose(G, ref, atol=1e-10)


def test_gram_matvec_interpret_matches_dense():
    from stpy_tpu.ops.pallas_gram_matvec import (
        _gram_matvec_pallas, _matvec_jnp,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (70, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (45, 3)), jnp.float32)
    v = jnp.asarray(rng.standard_normal(45), jnp.float32)
    for family, nu in [("se", 1.0), ("matern", 1.5)]:
        out = _gram_matvec_pallas(
            x, y, v, 1.2, family=family, nu=nu, block_m=8, block_n=128,
            interpret=True,
        )
        ref = _matvec_jnp(x, y, v, 1.2, family, nu)
        assert np.allclose(out, ref, atol=1e-4), family


def test_lazy_matvec_cg_matches_dense_gp_solve():
    from stpy_tpu.ops.pallas_gram_matvec import make_lazy_matvec
    from stpy_tpu.parallel.iterative import cg_solve

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(-1, 1, (300, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1])).reshape(-1)
    gamma, s = 0.5, 0.3  # larger noise keeps CG iterations modest
    mv = make_lazy_matvec(x, family="se", gamma=gamma, noise=s)
    alpha, it, res = cg_solve(mv, y, tol=1e-10, maxiter=400)
    K = jnp.exp(-F.sq_dist(x / gamma, x / gamma) / 2) + s * s * jnp.eye(300)
    ref = jnp.linalg.solve(K, y)
    assert float(jnp.max(jnp.abs(alpha - ref))) < 1e-6


def test_gram_matvec_custom_vjp_all_args():
    import math
    from stpy_tpu.ops.pallas_gram_matvec import gram_matvec

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(-1, 1, (20, 3)))
    y = jnp.asarray(rng.uniform(-1, 1, (15, 3)))
    v = jnp.asarray(rng.standard_normal(15))

    for fam, nu in [("se", 1.0), ("matern", 1.5), ("matern", 0.5)]:
        def dense(x, y, v, g, k):
            sq = F.sq_dist(x / g, y / g)
            r = jnp.sqrt(sq + 1e-30)
            if fam == "se":
                K = k * jnp.exp(-sq / 2)
            elif nu == 0.5:
                K = k * jnp.exp(-r)
            else:
                K = k * (1 + math.sqrt(3) * r) * jnp.exp(-math.sqrt(3) * r)
            return K @ v

        loss_l = lambda *a: jnp.sum(
            gram_matvec(a[0], a[1], a[2], family=fam, gamma=a[3],
                        kappa=a[4], nu=nu) ** 2)
        loss_d = lambda *a: jnp.sum(dense(*a) ** 2)
        gl = jax.grad(loss_l, argnums=(0, 1, 2, 3, 4))(x, y, v, 0.7, 1.3)
        gd = jax.grad(loss_d, argnums=(0, 1, 2, 3, 4))(x, y, v, 0.7, 1.3)
        for a, b in zip(gl, gd):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-8, (fam, nu)

    # ARD per-dim lengthscale gradient
    g = jnp.asarray([0.5, 0.8, 1.2])
    ga = jax.grad(lambda g: jnp.sum(
        gram_matvec(x, y, v, family="se", gamma=g, kappa=1.1) ** 2))(g)
    gb = jax.grad(lambda g: jnp.sum(
        (1.1 * jnp.exp(-F.sq_dist(x / g, y / g) / 2) @ v) ** 2))(g)
    assert float(jnp.max(jnp.abs(ga - gb))) < 1e-8
