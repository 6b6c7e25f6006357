import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import BorelSet, HierarchicalBorelSets
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GammaContProcess, GaussianProcess
from stpy_tpu.point_processes import SeasonalPoissonPointProcess
from stpy_tpu.test_functions.swissfel_simulator import FelSimulator
from stpy_tpu.utils.helper import (
    batch_jacobian,
    complex_step_gradient,
    finite_difference_gradient,
)
from stpy_tpu.sampling import euler_maruyama


def test_seasonal_process():
    proc = SeasonalPoissonPointProcess(d=1, B=2.0, b=0.2)
    S = BorelSet(1, [[-1.0, 1.0]])
    x = proc.sample_at_time(jax.random.PRNGKey(0), S, t=0.25, dt=5.0)
    assert x is None or x.shape[1] == 1
    r1 = float(proc.rate_at_time(jnp.zeros((1, 1)), t=0.25)[0, 0])
    r2 = float(proc.rate_at_time(jnp.zeros((1, 1)), t=0.75)[0, 0])
    assert r1 > r2  # modulation peaks at t=0.25


def test_fel_simulator():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (40, 2))
    y = -np.sum(x**2, axis=1, keepdims=True)
    sim = FelSimulator(d=2, sigma=0.01)
    sim.load_fresh(x, y)
    gp = GaussianProcess(gamma=0.5, s=0.01, d=2)
    sim.fit_simulator(gp, optimize=None)
    val = sim.eval_noiseless(np.zeros((1, 2)))
    assert float(val[0, 0]) > -0.3  # near the peak
    b = np.asarray(sim.bounds())
    assert b.shape == (2, 2)


def test_gamma_cont_process():
    gp = GammaContProcess(gamma=0.5, s=0.1, d=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (20, 1))
    gp.fit_gp(x, np.sin(x))
    mu, std = gp.mean_var(np.linspace(-1, 1, 8)[:, None])
    assert mu.shape == (8, 1)
    assert gp.get_gamma(100) > 0


def test_gradient_helpers():
    f = lambda v: float(np.sum(np.asarray(v) ** 2))
    g_fd = finite_difference_gradient(f, np.array([1.0, -2.0]))
    assert np.allclose(g_fd, [2.0, -4.0], atol=1e-5)
    fc = lambda v: np.sum(v**2)
    g_cs = complex_step_gradient(fc, np.array([1.0, -2.0]))
    assert np.allclose(g_cs, [2.0, -4.0], atol=1e-12)
    J = batch_jacobian(lambda v: v**2, jnp.asarray([[1.0, 2.0], [3.0, 4.0]]))
    assert J.shape == (2, 2, 2)


def test_euler_maruyama_ou_process():
    """OU process dx = -x dt + sqrt(2) dW has stationary variance 1."""
    xs = euler_maruyama(
        jax.random.PRNGKey(0), lambda x: -x, lambda x: jnp.sqrt(2.0),
        jnp.zeros(8), dt=0.01, steps=20000,
    )
    v = float(jnp.var(xs[5000:]))
    assert abs(v - 1.0) < 0.15


def test_visualize_smoke(tmp_path):
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (20, 1))
    gp = GaussianProcess(gamma=0.5, s=0.05, d=1)
    gp.fit_gp(x, np.sin(3 * x))
    xt = np.linspace(-1, 1, 50)[:, None]
    gp.visualize(xt, show=False)
    plt.close("all")
    # 2-d contour
    x2 = rng.uniform(-1, 1, (30, 2))
    gp2 = GaussianProcess(gamma=0.5, s=0.05, d=2)
    gp2.fit_gp(x2, np.sin(3 * x2[:, :1]))
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, 10), np.linspace(-1, 1, 10)), -1
    ).reshape(-1, 2)
    gp2.visualize_contour(grid, show=False)
    plt.close("all")


def test_cvae_trains():
    from stpy_tpu.generative_models import CVAE

    rng = np.random.default_rng(3)
    n, feat, cond = 256, 16, 4
    labels = rng.integers(0, cond, n)
    X = (rng.uniform(size=(n, feat)) < (0.2 + 0.6 * (labels[:, None] % 2))).astype(
        float
    )
    Y = np.eye(cond)[labels]
    cvae = CVAE(feature_size=feat, latent_size=4, cond_size=cond, midsize=32)
    cvae.fit(X, Y, epochs=5, batch=64, lr=1e-2)
    samples = cvae.sample(Y[:1], size=10)
    assert samples.shape == (10, feat)
    assert float(jnp.min(samples)) >= 0 and float(jnp.max(samples)) <= 1
