"""Smoke + behavior tests for the small helper modules (coresets, groups,
viz, reference-layout helpers re-export)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import BorelSet
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.utils.coresets import (
    coreset_leverage_score_greedy,
    epsilon_net,
)
from stpy_tpu.utils.groups import all_pairs, generate_groups, singletons


def test_epsilon_net_shape_and_bounds():
    S = BorelSet(2, [[-1.0, 1.0], [0.0, 2.0]])
    X = epsilon_net(S, 8)
    assert X.shape == (64, 2)
    assert float(X[:, 0].min()) >= -1.0 and float(X[:, 1].max()) <= 2.0


def test_leverage_coreset_spreads_points():
    S = BorelSet(1, [[-1.0, 1.0]])
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.2, d=1)
    pts = coreset_leverage_score_greedy(S, k, n=6, grid=64)
    pts = np.sort(np.asarray(pts).ravel())
    # greedy max-variance selection spreads out: min gap bounded below
    assert pts.shape[0] == 6
    assert np.min(np.diff(pts)) > 0.15


def test_generate_groups_bell_numbers():
    # Bell numbers: B(1)=1, B(2)=2, B(3)=5, B(4)=15
    for d, bell in [(1, 1), (2, 2), (3, 5), (4, 15)]:
        parts = generate_groups(d)
        assert len(parts) == bell
        for part in parts:  # each is a partition of {0..d-1}
            flat = sorted(i for g in part for i in g)
            assert flat == list(range(d))
    assert all_pairs(3) == [[0, 1], [0, 2], [1, 2]]
    assert singletons(2) == [[0], [1]]


def test_helpers_reference_layout_reexports():
    import stpy_tpu.helpers as H

    assert callable(H.cartesian)
    assert callable(H.interval)
    assert callable(H.maximize_on_elliptical_slice)
    assert callable(H.sample_qmc_halton)
    assert callable(H.r_score_std)
    # HMC sampler for truncated Gaussians lives at the reference path
    assert hasattr(H, "HmcSampler") and hasattr(H, "tmg")


def test_viz_mixin_headless_plot(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (24, 1)))
    y = jnp.sin(3 * x)
    gp = GaussianProcess(gamma=0.4, s=0.05, d=1)
    gp.fit_gp(x, y)
    gp.visualize(jnp.linspace(-1, 1, 64)[:, None], show=False)
    import matplotlib.pyplot as plt

    plt.savefig(tmp_path / "gp.png")
    plt.close("all")
    assert (tmp_path / "gp.png").exists()


def test_fit_metrics_timed_and_time_jitted():
    from stpy_tpu.utils.metrics import FitMetrics, time_jitted, timed

    m = FitMetrics(name="demo")
    with timed(m):
        v = float(jnp.sum(jnp.ones((100, 100)) @ jnp.ones((100, 100))))
    assert v == 100 * 100 * 100
    d = m.as_dict()
    assert d["name"] == "demo" and d["wall_time_s"] > 0

    f = jax.jit(lambda x: (x @ x).sum())
    compile_t, run_t = time_jitted(f, jnp.ones((64, 64)))
    assert compile_t > 0 and run_t > 0
