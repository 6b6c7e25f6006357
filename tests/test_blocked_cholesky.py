"""Distributed blocked Cholesky + DistributedExactGP vs dense references
(8 virtual CPU devices, see conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models.exact_gp import GaussianProcess
from stpy_tpu.parallel.blocked import (
    DistributedExactGP,
    blocked_cholesky,
    chol_sharded,
)


def _spd(n, key=0):
    A = jax.random.normal(jax.random.PRNGKey(key), (n, n))
    return A @ A.T + n * jnp.eye(n)


def test_blocked_cholesky_matches_dense():
    K = _spd(256)
    L = blocked_cholesky(K, nb=64)
    Lref = jnp.linalg.cholesky(K)
    assert float(jnp.max(jnp.abs(L - Lref))) < 1e-8


def test_chol_sharded_mesh_and_padding():
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    K = _spd(392, key=1)  # 392 not divisible by nb=128 -> padding path
    L = chol_sharded(K, mesh, nb=128)
    Lref = jnp.linalg.cholesky(K)
    assert L.shape == (392, 392)
    assert float(jnp.max(jnp.abs(L - Lref))) < 1e-8


def test_distributed_exact_gp_matches_dense_gp():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (200, 2), minval=-1, maxval=1)
    y = jnp.sin(3 * x[:, :1]) * jnp.cos(2 * x[:, 1:]) \
        + 0.01 * jax.random.normal(jax.random.PRNGKey(3), (200, 1))
    xt = jax.random.uniform(jax.random.PRNGKey(4), (64, 2), minval=-1,
                            maxval=1)

    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    ref = GaussianProcess(kernel=k, s=0.1)
    ref.fit_gp(x, y)
    mu_ref, std_ref = ref.mean_std(xt)

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    dist = DistributedExactGP(k, s=0.1, mesh=mesh, nb=64)
    dist.fit_gp(x, y)
    mu, std = dist.mean_std(xt)

    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6
    assert float(jnp.max(jnp.abs(std - std_ref))) < 1e-6


def test_chol_recursive_matches_dense():
    from stpy_tpu.linalg import chol_recursive
    K = _spd(300, key=5)  # padding path (300 % 128 != 0)
    L = chol_recursive(K, nb=128)
    Lref = jnp.linalg.cholesky(K)
    assert L.shape == (300, 300)
    assert float(jnp.max(jnp.abs(L - Lref))) < 1e-8


def test_cho_solve_blocked_matches_cho_solve():
    from stpy_tpu.linalg import cho_solve, cho_solve_blocked
    K = _spd(300, key=6)
    L = jnp.linalg.cholesky(K)
    b = jax.random.normal(jax.random.PRNGKey(7), (300, 3))
    x = cho_solve_blocked(L, b, nb=128)
    xref = cho_solve(L, b)
    assert float(jnp.max(jnp.abs(x - xref))) < 1e-8


def test_distributed_gp_refit_different_n():
    key = jax.random.PRNGKey(9)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    gp = DistributedExactGP(k, s=0.1, mesh=mesh, nb=32)
    for n in (96, 160):  # refit with a different n must not reuse stale jit
        x = jax.random.uniform(jax.random.PRNGKey(n), (n, 1), minval=-1,
                               maxval=1)
        y = jnp.sin(3 * x)
        gp.fit_gp(x, y)
        mu, std = gp.mean_std(x[:10])
        ref = GaussianProcess(kernel=k, s=0.1)
        ref.fit_gp(x, y)
        mu_ref, std_ref = ref.mean_std(x[:10])
        assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6
        assert float(jnp.max(jnp.abs(std - std_ref))) < 1e-6


def test_chol_sharded_rec_matches_dense():
    """FLOP-optimal recursive sharded factorization (VERDICT r1 item 7):
    same answer as the dense Cholesky on an 8-device row-sharded mesh,
    including the padded (n % nb != 0) path."""
    from stpy_tpu.parallel import chol_sharded_rec

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    for n in (512, 400):
        K = _spd(n)
        L = chol_sharded_rec(K, mesh, nb=128)
        Lref = np.linalg.cholesky(np.asarray(K))
        np.testing.assert_allclose(np.asarray(L), Lref, atol=1e-8)


def test_distributed_gp_rec_matches_masked():
    """The rec and masked factorizations give the same posterior."""
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (192, 2)))
    y = jnp.sin(3 * x[:, :1])
    xt = jnp.asarray(rng.uniform(-1, 1, (48, 2)))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    outs = []
    for fac in ("rec", "masked"):
        gp = DistributedExactGP(k, s=0.1, mesh=mesh, nb=64,
                                factorization=fac)
        gp.fit_gp(x, y)
        outs.append(gp.mean_std(xt))
    np.testing.assert_allclose(np.asarray(outs[0][0]),
                               np.asarray(outs[1][0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(outs[0][1]),
                               np.asarray(outs[1][1]), atol=1e-7)
