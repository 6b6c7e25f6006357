"""Multi-host (DCN) data loading: per-host shards assembled into globally
sharded device arrays, plus a host-local streamed-statistics loop.

The reference is single-process torch and has no multi-host story (SURVEY.md
§2.11 names host-sharded loading as the TPU rebuild's value-add). The design
follows the JAX multi-controller model: every process runs the same program,
each loads ONLY its own rows from storage, and
`jax.make_array_from_process_local_data` stitches the per-process shards into
one global `jax.Array` laid out over the mesh — no row ever crosses DCN.
Cross-host traffic is limited to the (m, m)/(m, 1) sufficient statistics
psummed at the end of a streamed fit, which is the only communication a
primal feature-GP fit fundamentally needs.

Everything here is single-process compatible (process_count == 1 is just the
degenerate layout), so the full path is exercised on the 8-virtual-device
CPU mesh in tests and by `dryrun_multichip`.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from stpy_tpu.linalg import safe_cholesky, cho_solve


def host_sharded(local: np.ndarray, mesh: Mesh, axis: str = "tp"):
    """Assemble per-process row shards into one global row-sharded jax.Array.

    `local` is THIS process's rows (equal count per process). The result is a
    global array of shape (rows * process_count, ...) sharded over `axis`;
    under a single process it is exactly `device_put` with that sharding.
    """
    sharding = NamedSharding(mesh, P(axis, *([None] * (np.ndim(local) - 1))))
    local = np.ascontiguousarray(local)
    return jax.make_array_from_process_local_data(sharding, local)


class HostShardedLoader:
    """Iterate global (x, y) batches whose rows are loaded host-locally.

    `local_source(start, stop)` returns this process's rows [start, stop) of
    its OWN partition — each host owns `n_global / process_count` contiguous
    rows and is never asked for anyone else's. Batches come out as global
    arrays row-sharded over `axis`, ready for `sharded_gram`/`shard_map`
    consumers. The final ragged batch is dropped (static shapes under jit;
    callers needing every row pad their source).
    """

    def __init__(self, local_source: Callable[[int, int], tuple],
                 n_local: int, batch_size: int, mesh: Mesh, axis: str = "tp"):
        self.local_source = local_source
        self.n_local = n_local
        self.mesh = mesh
        self.axis = axis
        # per-process slice of each global batch
        self.local_batch = max(1, batch_size // jax.process_count())
        self.n_batches = n_local // self.local_batch

    def __len__(self) -> int:
        return self.n_batches

    def __iter__(self) -> Iterator[tuple]:
        for b in range(self.n_batches):
            lo = b * self.local_batch
            out = self.local_source(lo, lo + self.local_batch)
            if not isinstance(out, tuple):
                out = (out,)
            yield tuple(host_sharded(a, self.mesh, self.axis) for a in out)


def streamed_feature_stats(embed_fn, loader: HostShardedLoader,
                           m: int, dtype=None):
    """Accumulate V = ΣQᵀQ and b = ΣQᵀy over a host-sharded loader.

    Per batch, each device embeds ITS rows and forms partial (m, m)/(m, 1)
    statistics; `psum` over the mesh axis reduces them (ICI within a host,
    DCN across hosts — m² floats per batch, independent of n). This is the
    multi-host face of `KernelizedFeatures.fit_gp_streamed`
    (models/feature_gp.py:94): same sufficient statistics, rows never move.

    Returns (V, b) replicated on every device/process.
    """
    mesh, axis = loader.mesh, loader.axis

    @jax.jit
    def _accumulate(V, b, xb, yb):
        def local(xl, yl):
            Q = embed_fn(xl)
            dV = jax.lax.psum(Q.T @ Q, axis)
            db = jax.lax.psum(Q.T @ yl, axis)
            return dV, db

        dV, db = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=(P(), P()),
        )(xb, yb)
        return V + dV, b + db

    dt = dtype or jnp.zeros(0).dtype
    V = jnp.zeros((m, m), dt)
    b = jnp.zeros((m, 1), dt)
    for xb, yb in loader:
        V, b = _accumulate(V, b, xb, yb)
    return V, b


def fit_feature_gp_sharded(model, loader: HostShardedLoader):
    """Fit a `KernelizedFeatures` model from a host-sharded loader: streamed
    sufficient statistics over the mesh, then the standard primal state
    (theta_mean / mean_std / ucb work afterwards). The model never sees the
    raw rows; `model.x/y` stay None."""
    dt = jnp.zeros(0).dtype
    V, b = streamed_feature_stats(model.embed, loader, model.m, dt)
    V = V + model.s**2 * model.lam * jnp.eye(model.m, dtype=dt)
    model.V = V
    model.invV = cho_solve(safe_cholesky(V).L, jnp.eye(model.m, dtype=dt))
    model._Qty = b
    model.Q = None
    model.n = len(loader) * loader.local_batch * jax.process_count()
    model.x = model.y = None
    model.dual = False
    model.data = True
    model.fitted = True
    model.to_add = []
    return model
