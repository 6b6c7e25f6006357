"""Multi-host (DCN) data loading (parallel/data.py), exercised on the
8-virtual-device CPU mesh: per-host shard assembly, the host-sharded batch
loader, and the sharded streamed feature-GP fit (sufficient statistics psum
over the mesh — the only bytes that would cross DCN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.embeddings import HermiteEmbedding
from stpy_tpu.models import KernelizedFeatures
from stpy_tpu.parallel import (
    HostShardedLoader,
    fit_feature_gp_sharded,
    host_sharded,
    make_mesh,
    streamed_feature_stats,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must create 8 virtual devices"
    return make_mesh((1, 8), ("dp", "tp"))


def _dataset(n=256, d=2, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, d))
    y = np.sin(3 * x[:, :1]) + 0.05 * rng.standard_normal((n, 1))
    return x, y


def test_host_sharded_assembles_global_rows(mesh8):
    x, _ = _dataset(64)
    g = host_sharded(x, mesh8, "tp")
    assert g.shape == (64, 2)
    assert len(g.sharding.device_set) == 8
    # every device holds 64/8 = 8 contiguous rows
    shard = next(s for s in g.addressable_shards if s.index[0].start == 8)
    assert np.allclose(np.asarray(shard.data), x[8:16])
    assert np.allclose(np.asarray(g), x)


def test_loader_yields_sharded_batches_in_order(mesh8):
    x, y = _dataset(200)

    def source(lo, hi):
        return x[lo:hi], y[lo:hi]

    loader = HostShardedLoader(source, n_local=200, batch_size=64,
                               mesh=mesh8, axis="tp")
    batches = list(loader)
    assert len(loader) == len(batches) == 3  # final ragged 8 rows dropped
    xb, yb = batches[1]
    assert xb.shape == (64, 2) and yb.shape == (64, 1)
    assert np.allclose(np.asarray(xb), x[64:128])
    assert np.allclose(np.asarray(yb), y[64:128])


def test_streamed_stats_match_dense(mesh8):
    x, y = _dataset(128)
    emb = HermiteEmbedding(gamma=0.5, m=8, d=2)
    loader = HostShardedLoader(lambda lo, hi: (x[lo:hi], y[lo:hi]),
                               n_local=128, batch_size=32, mesh=mesh8)
    V, b = streamed_feature_stats(emb.embed, loader, emb.get_m())
    Q = emb.embed(jnp.asarray(x))
    assert np.allclose(V, Q.T @ Q, atol=1e-10)
    assert np.allclose(b, Q.T @ jnp.asarray(y), atol=1e-10)


def test_sharded_fit_matches_in_memory_fit(mesh8):
    x, y = _dataset(256, d=1, seed=11)
    xt = np.linspace(-1, 1, 32)[:, None]
    emb = HermiteEmbedding(gamma=0.5, m=64, d=1)

    ref = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.05, lam=1.0,
                             primal=True, d=1)
    ref.fit_gp(x, y)
    mu_ref, std_ref = ref.mean_std(jnp.asarray(xt))

    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.05, lam=1.0,
                           primal=True, d=1)
    loader = HostShardedLoader(lambda lo, hi: (x[lo:hi], y[lo:hi]),
                               n_local=256, batch_size=64, mesh=mesh8)
    fit_feature_gp_sharded(F, loader)
    assert F.n == 256
    mu, std = F.mean_std(jnp.asarray(xt))
    assert np.abs(np.asarray(mu) - np.asarray(mu_ref)).max() < 1e-8
    assert np.abs(np.asarray(std) - np.asarray(std_ref)).max() < 1e-8
