import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.approx_inference import ExpectedPropagationQuadratic, SGCPVariational
from stpy_tpu.dimred import SRI
from stpy_tpu.domains import BorelSet
from stpy_tpu.embeddings import HermiteEmbedding
from stpy_tpu.embeddings.random_nn import RandomMap, RandomNestedMap
from stpy_tpu.feature_importance import FeatureRanker
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import (
    CategoricalMixture,
    ConvexRKHS,
    DirichletMixture,
    GaussianProcess,
    GaussianProcessFF,
    TraceFeatures,
    TruncatedKernelizedFeatures,
)
from stpy_tpu.point_processes import PoissonPointProcess
from stpy_tpu.test_functions.protein_benchmark import ProteinOperator
from stpy_tpu.utils.sampling import (
    halton_sequence,
    randomly_split_set_without_duplicates,
)
from stpy_tpu.utils.transforms import (
    haar_fisz_transform,
    inverse_haar_fisz_transform,
    r_score_std,
    transform,
)


def test_sgcp_variational_recovers_rate():
    """SGCP on a step-intensity process: high/low regions separated."""
    S = BorelSet(1, [[-1.0, 1.0]])
    rate_fn = lambda x, dt=1.0: (4.0 * (x[:, :1] > 0) + 0.5) * dt
    proc = PoissonPointProcess(d=1, B=5.0, rate=rate_fn)
    key = jax.random.PRNGKey(0)
    obs = []
    for _ in range(20):  # 20 rounds of dt=1 sensing
        key, sub = jax.random.split(key)
        x = proc.sample_discretized(sub, S, 1.0, n=128)
        if x is not None:
            obs.append(np.asarray(x))
    X = np.concatenate(obs, axis=0)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    # note: 20 rounds => effective exposure 20; rescale via dt trick:
    # model sees the superposition as one realization with λ' = 20 λ
    sgcp = SGCPVariational(k, S, X, num_inducing=16, num_integration=64)
    elbo = sgcp.run(steps=400, lr=5e-2)
    assert np.isfinite(elbo)
    xt = np.linspace(-0.9, 0.9, 40)[:, None]
    r = np.asarray(sgcp.mean_rate_points(xt)).ravel() / 20.0
    left = r[xt.ravel() < -0.2].mean()
    right = r[xt.ravel() > 0.2].mean()
    assert right > 3 * left  # clear separation
    assert abs(right - 4.5) / 4.5 < 0.5
    lcb, ucb = sgcp.rate_bands(xt, delta=0.1, samples=64)
    assert bool(jnp.all(ucb >= lcb))


def test_ep_quadratic_matches_conjugate_gaussian():
    """Gaussian sites: EP must equal the exact conjugate posterior."""
    d = 2
    mu0 = jnp.zeros(d)
    Sigma0 = jnp.eye(d)
    A = jnp.asarray(np.random.default_rng(0).standard_normal((5, d)))
    y_obs = np.asarray([0.5, -0.2, 0.1, 0.3, -0.4])
    sigma = 0.5

    def site(z, datum):
        return jnp.exp(-0.5 * (z - datum) ** 2 / sigma**2)

    ep = ExpectedPropagationQuadratic(mu0, Sigma0, site, list(y_obs), A=A)
    mu, Sigma = ep.fit_gp(iterations=20)
    # exact posterior
    An = np.asarray(A)
    P = np.eye(d) + An.T @ An / sigma**2
    Sig_ref = np.linalg.inv(P)
    mu_ref = Sig_ref @ (An.T @ y_obs / sigma**2)
    assert np.allclose(mu, mu_ref, atol=1e-4)
    assert np.allclose(Sigma, Sig_ref, atol=1e-4)


def test_dirichlet_and_categorical_mixture():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (30, 1))
    y = np.sin(3 * x)
    gps = [
        GaussianProcess(gamma=0.5, s=0.1, d=1),
        GaussianProcess(gamma=2.0, s=0.1, d=1),
    ]
    mix = DirichletMixture(gps)
    mix.fit_gp(x, y)
    xt = np.linspace(-1, 1, 16)[:, None]
    mu, s = mix.mean_var(xt, N=20)
    assert mu.shape == (16, 1) and bool(jnp.all(jnp.isfinite(s)))

    cat = CategoricalMixture(gps)
    cat.fit_gp(x, y)
    f = cat.sample(xt, size=3)
    assert f.shape == (16, 3)
    best = cat.map_model()
    assert best == 0  # short lengthscale explains sin(3x) better


def test_gaussian_process_ff_wrapper():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (40, 2))
    y = np.sin(3 * x[:, :1]) + x[:, 1:]
    for approx in ["hermite", "rff", "quad"]:
        F = GaussianProcessFF(gamma=0.5, s=0.1, m=128, d=2, approx=approx)
        F.fit_gp(x, y)
        mu, std = F.mean_std(x)
        assert np.abs(np.asarray(mu) - y).mean() < 0.2, approx
    # additive groups
    F = GaussianProcessFF(
        gamma=0.5, s=0.1, m=64, d=2, approx="hermite", groups=[[0], [1]]
    )
    F.fit_gp(x, y)
    mu, _ = F.mean_std(x)
    assert np.abs(np.asarray(mu) - y).mean() < 0.2


def test_trace_features():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (50, 1))
    emb = HermiteEmbedding(gamma=0.6, m=8, d=1)
    A_true = np.diag([1.0, -0.5] + [0.0] * 6)
    Phi = np.asarray(emb.embed(x))
    y = np.einsum("ij,jk,ik->i", Phi, A_true, Phi)[:, None]
    tf = TraceFeatures(embedding=emb, m=8, s=0.1, lam=0.01)
    tf.fit_gp(x, y)
    mu, std = tf.mean_std(x)
    assert np.abs(np.asarray(mu) - y).mean() < 0.1
    # PSD variant runs
    y_psd = np.einsum("ij,jk,ik->i", Phi, np.diag([1.0] * 8), Phi)[:, None]
    tf2 = TraceFeatures(embedding=emb, m=8, s=0.1, lam=0.01, PSD=True)
    tf2.fit_gp(x, y_psd)
    w = np.linalg.eigvalsh(np.asarray(tf2.A))
    assert w.min() > -1e-8


def test_truncated_features():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (40, 1))
    y = np.sin(3 * x)
    y[5] = 100.0  # huge outlier, should be truncated away
    emb = HermiteEmbedding(gamma=0.5, m=32, d=1)
    tk = TruncatedKernelizedFeatures(
        emb, m=32, s=0.1, default_alpha_score=2.0
    )
    tk.fit_gp(x, y)
    mu, _ = tk.mean_std(x)
    clean = np.delete(np.arange(40), 5)
    assert np.abs(np.asarray(mu)[clean] - y[clean]).mean() < 0.2


def test_convex_rkhs():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (25, 1))
    y = x**2
    emb = HermiteEmbedding(gamma=0.8, m=16, d=1)
    cr = ConvexRKHS(emb, m=16, lam=1e-3, s=0.1)
    cr.fit_gp(x, y)
    cr.optimize_params(restarts=2, maxiter=30)
    mu, _ = cr.mean_std(x)
    assert np.abs(np.asarray(mu) - y).mean() < 0.15


def test_random_nn_maps():
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (60, 2))
    y = np.tanh(x @ np.array([[1.0], [-2.0]]))
    rm = RandomMap(d=2, m=64, output=1, seed=0)
    rm.fit_map(x, y, epochs=300, reg=1e-4, lr=0.05)
    pred = np.asarray(rm.map(x))
    assert np.abs(pred - y).mean() < 0.15
    rm.fit_last_layer(x, y)
    assert np.abs(np.asarray(rm.map(x)) - y).mean() < 0.15
    nested = RandomNestedMap(d=2, m=32, output=1)
    assert nested.embed(x).shape == (60, 32)


def test_sri_dimension_reduction():
    rng = np.random.default_rng(6)
    X = rng.standard_normal((400, 5))
    beta = np.array([1.0, -1.0, 0.0, 0.0, 0.0]) / np.sqrt(2)
    y = np.sin(X @ beta) + 0.01 * rng.standard_normal(400)
    sri = SRI()
    dirs, vals = sri.fit_sri(X, y, buckets=10)
    top = np.asarray(dirs[:, 0])
    top = top / np.linalg.norm(top)
    assert abs(abs(top @ beta)) > 0.9  # recovers the direction


def test_feature_ranker():
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (60, 3))
    y = np.sin(3 * x[:, :1])  # only feature 0 matters
    gp = GaussianProcess(gamma=0.5, s=0.1, d=3)
    gp.fit_gp(x, y)
    fr = FeatureRanker(gp, x, y)
    imp = fr.importance(repeats=3)
    assert imp[0] > imp[1] and imp[0] > imp[2]


def test_transforms_and_sampling_helpers():
    X = np.random.default_rng(8).uniform(2, 5, (20, 2))
    Xt, fwd, inv = transform(X, low=-1, high=1)
    assert float(jnp.min(Xt)) >= -1 - 1e-9 and float(jnp.max(Xt)) <= 1 + 1e-9
    assert np.allclose(inv(Xt), X, atol=1e-9)

    h = halton_sequence(100, 2)
    assert h.shape == (100, 2) and h.min() >= 0 and h.max() <= 1
    # low discrepancy: mean close to 0.5
    assert abs(h.mean() - 0.5) < 0.03

    data = np.random.default_rng(9).poisson(5.0, 64).astype(float)
    tr = haar_fisz_transform(data)
    back = inverse_haar_fisz_transform(tr)
    assert np.allclose(back, data, atol=1e-8)

    x_dup = np.array([[1.0], [1.0], [2.0], [3.0], [3.0], [4.0]])
    sets = randomly_split_set_without_duplicates(x_dup, [3, 3])
    s0 = set(x_dup[sets[0]].ravel().tolist())
    s1 = set(x_dup[sets[1]].ravel().tolist())
    assert not (s0 & s1)  # duplicates kept together

    r2 = r_score_std(np.array([1.0, 2, 3]), np.array([1.0, 2, 3]),
                     np.array([0.1, 0.1, 0.1]))
    assert r2 == pytest.approx(1.0)


def test_protein_operator():
    op = ProteinOperator()
    codes = op.translate([["A", "R"], ["N", "D"]])
    assert codes.tolist() == [[0, 1], [2, 3]]
    oh = op.translate_one_hot(codes)
    assert oh.shape == (2, 40)
    assert float(oh.sum()) == 4.0
    pos, src, dst = op.get_variant_code("A123T")
    assert (pos, src, dst) == (123, "A", "T")
