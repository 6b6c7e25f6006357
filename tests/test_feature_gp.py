import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.embeddings import HermiteEmbedding
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess, KernelizedFeatures


@pytest.fixture
def data1d():
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (50, 1))
    y = np.sin(3 * x) + 0.05 * rng.standard_normal((50, 1))
    xt = np.linspace(-1, 1, 32)[:, None]
    return x, y, xt


def _feature_gp(x, y, m=64, s=0.05, primal=True):
    emb = HermiteEmbedding(gamma=0.5, m=m, d=1)
    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=s, lam=1.0,
                           primal=primal, d=1)
    F.fit_gp(x, y)
    return F


def test_feature_gp_matches_exact_gp(data1d):
    """QFF posterior must match the exact GP posterior closely (the
    fourier-features tutorial claim)."""
    x, y, xt = data1d
    F = _feature_gp(x, y, m=128)
    gp = GaussianProcess(gamma=0.5, s=0.05, d=1)
    gp.fit_gp(x, y)
    mu_f, std_f = F.mean_std(xt)
    mu_e, std_e = gp.mean_std(xt)
    assert np.abs(np.asarray(mu_f) - np.asarray(mu_e)).max() < 1e-4
    assert np.abs(np.asarray(std_f) - np.asarray(std_e)).max() < 1e-4


def test_primal_dual_agree(data1d):
    x, y, xt = data1d
    Fp = _feature_gp(x, y, m=128, primal=True)
    Fd = _feature_gp(x, y, m=128, primal=False)  # n=50 < m=128 -> dual
    assert Fd.dual and not Fp.dual
    mu_p, std_p = Fp.mean_std(xt)
    mu_d, std_d = Fd.mean_std(xt)
    assert np.allclose(mu_p, mu_d, atol=1e-6)
    assert np.allclose(std_p, std_d, atol=1e-6)


def test_woodbury_add_data_point_matches_refit(data1d):
    x, y, xt = data1d
    F = _feature_gp(x[:40], y[:40], m=64, primal=True)
    for i in range(40, 50):
        F.add_data_point(x[i : i + 1], y[i : i + 1])
    mu_inc, std_inc = F.mean_std(xt)
    F2 = _feature_gp(x, y, m=64, primal=True)
    mu_ref, std_ref = F2.mean_std(xt)
    assert np.allclose(mu_inc, mu_ref, atol=1e-7)
    assert np.allclose(std_inc, std_ref, atol=1e-7)


def test_dual_schur_add_data_point(data1d):
    x, y, xt = data1d
    F = _feature_gp(x[:20], y[:20], m=128, primal=False)
    for i in range(20, 30):
        F.add_data_point(x[i : i + 1], y[i : i + 1])
    mu_inc, _ = F.mean_std(xt)
    F2 = _feature_gp(x[:30], y[:30], m=128, primal=False)
    mu_ref, _ = F2.mean_std(xt)
    assert np.allclose(mu_inc, mu_ref, atol=1e-6)


def test_theta_mean_and_sampling(data1d):
    x, y, xt = data1d
    F = _feature_gp(x, y, m=64)
    tm, Z = F.theta_mean(var=True)
    assert tm.shape == (64, 1) and Z.shape == (64, 64)
    f = F.sample(xt, size=3000, key=jax.random.PRNGKey(0))
    mu, std = F.mean_std(xt)
    assert np.abs(jnp.mean(f, axis=1) - mu[:, 0]).max() < 0.05
    assert np.abs(jnp.std(f, axis=1) - std[:, 0]).max() < 0.05


def test_matheron_sampling_moments(data1d):
    x, y, xt = data1d
    F = _feature_gp(x, y, m=128)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    f = F.sample_matheron(xt, k, size=2000, key=jax.random.PRNGKey(1))
    gp = GaussianProcess(gamma=0.5, s=0.05, d=1)
    gp.fit_gp(x, y)
    mu_e, _ = gp.mean_std(xt)
    # pathwise samples should center on the exact posterior mean
    assert np.abs(jnp.mean(f, axis=1) - mu_e[:, 0]).max() < 0.1


def test_beta_theory_and_ucb(data1d):
    x, y, xt = data1d
    F = _feature_gp(x, y, m=64)
    F.beta_fun = "theory"
    b = float(F.beta(delta=0.1))
    assert b > 0
    assert bool(jnp.all(F.ucb(xt) >= F.lcb(xt)))


def test_effective_dim_and_logdet_ratio(data1d):
    x, y, xt = data1d
    F = _feature_gp(x, y, m=64)
    ed = float(F.effective_dim(jnp.asarray(x)))
    assert 0 < ed < 64
    assert np.isfinite(float(F.logdet_ratio()))


def test_constrained_theta_estimators(data1d):
    x, y, _ = data1d
    F = _feature_gp(x, y, m=128)  # m > n so interpolation is feasible
    t1 = F.theta_mean_constrained(B=1.0)
    assert float(jnp.linalg.norm(t1)) <= 1.0 + 1e-6
    t2 = F.theta_absolute_deviation()
    assert np.all(np.isfinite(t2))
    t3 = F.interpolation()
    # min-norm least squares: residual bounded by the numerically
    # achievable fit (QFF spectrum decays below the 0.05 noise floor)
    Q = F.embed(x)
    assert np.abs(np.asarray(Q @ t3) - y).max() < 0.15
    t4 = F.theta_chebyschev_approximation(eps=0.2)
    assert np.abs(np.asarray(Q @ t4) - y).max() < 0.3


def test_ucb_optimize_and_thompson(data1d):
    x, y, _ = data1d
    F = _feature_gp(x, y, m=64)
    F.bounds = [[-1.0, 1.0]]
    pt, val = F.ucb_optimize(beta=2.0, multistart=8)
    assert abs(float(pt[0, 0]) - np.pi / 6) < 0.2
    pt2, val2 = F.sample_and_optimize(multistart=8, key=jax.random.PRNGKey(3))
    assert -1.0 <= float(pt2[0]) <= 1.0


def test_kernel_method_convention(data1d):
    x, y, _ = data1d
    F = _feature_gp(x, y, m=64)
    K = F.kernel(x[:5], x[:3])
    assert K.shape == (3, 5)  # reference convention (n_y, n_x)


def test_streamed_fit_matches_in_memory():
    from stpy_tpu.embeddings import HermiteEmbedding
    from stpy_tpu.models import KernelizedFeatures

    rng = np.random.default_rng(71)
    x = jnp.asarray(rng.uniform(-1, 1, (500, 1)))
    y = jnp.sin(3 * x) + 0.05 * jnp.asarray(rng.standard_normal((500, 1)))
    xt = jnp.asarray(rng.uniform(-1, 1, (64, 1)))

    emb = HermiteEmbedding(gamma=0.4, m=64, d=1)
    F1 = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.1)
    F1.fit_gp(x, y)
    mu1, std1 = F1.mean_std(xt)

    F2 = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.1)
    F2.fit_gp_streamed(x, y, chunk=128)   # 500 -> 4 chunks with padding
    mu2, std2 = F2.mean_std(xt)

    assert float(jnp.max(jnp.abs(mu1 - mu2))) < 1e-9
    assert float(jnp.max(jnp.abs(std1 - std2))) < 1e-9


def test_add_data_point_after_streamed_fit():
    from stpy_tpu.embeddings import HermiteEmbedding
    from stpy_tpu.models import KernelizedFeatures

    rng = np.random.default_rng(72)
    x = jnp.asarray(rng.uniform(-1, 1, (300, 1)))
    y = jnp.sin(3 * x)
    xn = jnp.asarray([[0.33]])
    yn = jnp.sin(3 * xn)
    xt = jnp.asarray(rng.uniform(-1, 1, (32, 1)))

    emb = HermiteEmbedding(gamma=0.4, m=48, d=1)
    ref = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.1)
    ref.fit_gp(jnp.concatenate([x, xn]), jnp.concatenate([y, yn]))
    mu_ref, _ = ref.mean_std(xt)

    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.1)
    F.fit_gp_streamed(x, y, chunk=128)
    F.add_data_point(xn, yn)
    mu, _ = F.mean_std(xt)
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-8
