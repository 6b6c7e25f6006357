"""Typed config dataclasses: validation + build round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.configs import GPConfig, KernelConfig, PoissonRateConfig
from stpy_tpu.domains import BorelSet, HierarchicalBorelSets


def test_kernel_config_build_and_validate():
    k = KernelConfig(kernel_name="ard", d=3,
                     ard_gamma=(0.5, 0.7, 0.9)).build()
    X = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 3)))
    G = k.eval_params(k.params_dict, X, X)
    assert G.shape == (5, 5)
    with pytest.raises(ValueError, match="kernel_name"):
        KernelConfig(kernel_name="sqexp")


def test_gp_config_end_to_end():
    gp = GPConfig(kernel=KernelConfig(gamma=0.5), s=0.05).build()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (40, 1)))
    y = jnp.sin(3 * x)
    gp.fit_gp(x, y)
    mu, _ = gp.mean_std(x)
    assert float(jnp.max(jnp.abs(mu - y))) < 0.1
    with pytest.raises(ValueError, match="loss"):
        GPConfig(loss="l3")


def test_poisson_rate_config_builds_estimator():
    with pytest.raises(ValueError, match="basis"):
        PoissonRateConfig(basis="triangles")
    cfg = PoissonRateConfig(d=1, m=16, basis="triangle",
                            estimator="likelihood", B=2.0)
    hs = HierarchicalBorelSets(d=1, interval=(-1, 1), levels=3)
    est = cfg.build(None, hs)
    assert est.get_m() == 16
    assert est.estimator == "likelihood"
