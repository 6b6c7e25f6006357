import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import CandidateDiscreteSet
from stpy_tpu.embeddings import PackingEmbedding
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess
from stpy_tpu.opt import (
    KY_initialization,
    ellipsoid_cut,
    matrix_recovery_hermitian_trace_regression,
    maximum_volume_ellipsoid,
    newton_solve,
    optimize_psd,
    optimize_stiefel,
)
from stpy_tpu.opt.ellipsoid import (
    maximize_matrix_quadratic_on_ellipse,
    maximize_on_ellipsoid,
    maximize_on_elliptical_slice,
    minimize_matrix_quadratic_on_ellipse,
)
from stpy_tpu.utils.checkpoint import load_model, save_model, save_pytree, load_pytree
from stpy_tpu.utils.metrics import FitMetrics, time_jitted


def test_newton_solve_roots():
    x = newton_solve(lambda x: x**2 - 2.0, jnp.asarray([3.0]))
    assert abs(float(x[0]) - np.sqrt(2)) < 1e-3
    # vector field
    f = lambda v: jnp.asarray([v[0] ** 2 - 1.0, v[1] - 2.0])
    v = newton_solve(f, jnp.asarray([2.0, 0.0]))
    assert np.allclose(v, [1.0, 2.0], atol=1e-3)


def test_stiefel_optimization_procrustes():
    """min ||X - A||_F over orthogonal X = polar factor of A."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((4, 4)))

    def fun(X):
        return jnp.sum((X - A) ** 2)

    X, val = optimize_stiefel(fun, 4, 4, steps=500, lr=0.1, restarts=4)
    assert np.allclose(X.T @ X, np.eye(4), atol=1e-6)
    # polar factor reference
    U, _, Vt = np.linalg.svd(np.asarray(A))
    ref = U @ Vt
    assert float(fun(jnp.asarray(ref))) >= float(val) - 1e-6 or np.allclose(
        X, ref, atol=1e-2
    )


def test_psd_optimization():
    target = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])

    def fun(A):
        return jnp.sum((A - target) ** 2)

    A, val = optimize_psd(fun, 2, restarts=4)
    assert np.allclose(A, target, atol=1e-3)
    assert np.linalg.eigvalsh(np.asarray(A)).min() > -1e-8


def test_quadratic_on_ellipse_solvers():
    """Validate the TRS solver against brute force on the boundary."""
    rng = np.random.default_rng(1)
    Z = np.diag([3.0, 1.0])
    Sigma = np.eye(2)
    mu = np.array([0.5, 0.0])
    c = 1.0
    val, theta = maximize_matrix_quadratic_on_ellipse(
        jnp.asarray(Z), jnp.asarray(Sigma), jnp.asarray(mu), c
    )
    # brute force over the disc boundary + interior grid
    ts = np.linspace(0, 2 * np.pi, 2000)
    pts = mu + np.stack([np.cos(ts), np.sin(ts)], axis=1) * c
    brute = np.max(np.einsum("ni,ij,nj->n", pts, Z, pts))
    assert float(val) == pytest.approx(brute, rel=1e-3)

    vmin, _ = minimize_matrix_quadratic_on_ellipse(
        jnp.asarray(Z), jnp.asarray(Sigma), jnp.asarray(mu), c
    )
    assert float(vmin) == pytest.approx(0.0, abs=1e-6)  # 0 feasible


def test_elliptical_slice_with_box():
    """max x^T θ over ellipsoid ∩ box: the box must bind."""
    x = jnp.asarray([1.0, 0.0])
    Sigma = jnp.eye(2)
    mu = jnp.zeros(2)
    c = 2.0
    # unconstrained max is at (2, 0); box caps θ_0 ≤ 1
    val, theta = maximize_on_elliptical_slice(
        x, Sigma, mu, c,
        l=jnp.asarray([-10.0, -10.0]), Lambda=jnp.eye(2),
        u=jnp.asarray([1.0, 10.0]),
    )
    assert float(val) <= 1.0 + 1e-2
    assert float(val) >= 0.9  # should get close to the cap


def test_mve_khachiyan():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((100, 2)) @ np.diag([2.0, 0.5]) + np.array(
        [1.0, -1.0]
    )
    c, A = maximum_volume_ellipsoid(X)
    # all points inside (x-c)' A (x-c) <= 1 (+tol)
    vals = np.einsum("ni,ij,nj->n", X - c, A, X - c)
    assert vals.max() < 1.0 + 1e-2
    assert np.allclose(c, X.mean(axis=0), atol=1.0)
    idx = KY_initialization(X)
    assert len(idx) >= 2

    # ellipsoid cut shrinks volume
    c0 = jnp.zeros(2)
    B0 = jnp.eye(2)
    c1, B1 = ellipsoid_cut(c0, B0, jnp.asarray([1.0, 0.0]))
    assert float(jnp.linalg.det(B1)) < 1.0


def test_trace_regression_recovery():
    rng = np.random.default_rng(3)
    Z_true = np.diag([1.0, 0.5, 0.0])
    Xs = [rng.standard_normal((3, 3)) for _ in range(12)]
    Xs = [0.5 * (X + X.T) for X in Xs]
    b = [float(np.trace(X @ Z_true)) for X in Xs]
    Z = matrix_recovery_hermitian_trace_regression(Xs, b, eps=1e-4)
    assert np.abs(np.asarray(Z) - Z_true).max() < 0.1


def test_packing_embedding():
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    emb = PackingEmbedding(1, 12, k, grid=48)
    x = np.linspace(-1, 1, 20)[:, None]
    Phi = np.asarray(emb.embed(x))
    K_approx = Phi @ Phi.T
    K_true = np.asarray(k.gram(x))
    assert np.abs(K_approx - K_true).max() < 1e-3
    D1 = emb.derivative_1(x[:3])
    assert D1.shape == (3, 12, 1)


def test_candidate_discrete_set():
    C = CandidateDiscreteSet(np.array([[0.0, 1.0], [1.0, 0.0], [2.0, 2.0]]))
    C.remove([1])
    assert C.get_active_points().shape == (2, 2)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (30, 1))
    y = np.sin(3 * x)
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    mu_ref, std_ref = gp.mean_std(x)
    path = str(tmp_path / "gp_ckpt")
    save_model(path, gp)
    gp2 = GaussianProcess(gamma=0.9, s=0.1, d=1)  # wrong gamma on purpose
    load_model(path + ".npz", gp2)
    gp2._build_jits()
    mu2, std2 = gp2.mean_std(x)
    assert np.allclose(mu_ref, mu2, atol=1e-10)
    assert np.allclose(std_ref, std2, atol=1e-10)
    # pytree roundtrip
    tree = {"a": jnp.ones(3), "b": {"c": jnp.zeros((2, 2))}}
    save_pytree(str(tmp_path / "t"), tree)
    back = load_pytree(str(tmp_path / "t.npz"))
    assert np.allclose(back["a"], tree["a"])
    assert np.allclose(back["b"]["c"], tree["b"]["c"])


def test_metrics_timer():
    f = jax.jit(lambda x: jnp.sum(x * x))
    compile_t, run_t = time_jitted(f, jnp.ones(1000))
    assert compile_t >= run_t >= 0
    m = FitMetrics(name="test", nll=1.0)
    assert m.as_dict()["name"] == "test"


def test_cov_manifold_hyperopt():
    """PSD-manifold covariance optimization on a rotated anisotropic truth."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (40, 2))
    y = np.sin(4 * x[:, :1])  # only dim 0 matters, short scale
    k = KernelFunction(kernel_name="full_covariance_se", d=2)
    gp = GaussianProcess(kernel=k, s=0.1)
    gp.fit_gp(x, y)
    before = float(gp.log_marginal(k, {}, 1.0))
    gp.optimize_params(type="covariance", restarts=2, maxiter=100)
    after = float(gp.log_marginal(k, {}, 1.0))
    assert after <= before + 1e-6
