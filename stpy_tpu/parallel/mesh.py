"""Device-mesh scale-out: sharded Gram construction, distributed evidence,
and restart farming.

The reference has ZERO parallelism (SURVEY.md §2.11) — this module is the
TPU-native value-add. Design follows the scaling-book recipe: pick a mesh,
annotate shardings with NamedSharding/shard_map, let XLA insert ICI
collectives.

Axes:
  'dp' — restart/chain farming (embarrassingly parallel vmap batches:
          hyperopt restarts, Langevin chains, BO candidates)
  'tp' — data sharding for large-n Gram/solve (row-blocks of X; Gram tiles
          computed per-device against an all-gathered opposite operand —
          the same communication shape as ring attention on Gram tiles)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from stpy_tpu.linalg import chol_jittered, cho_solve, logdet_from_chol


def make_mesh(shape=None, axis_names=("dp", "tp"), devices=None):
    """Build a Mesh over available devices. Default: all devices on 'tp'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_rows(x, mesh, axis="tp"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_gram(kernel_fn, x, mesh, axis="tp"):
    """Row-sharded Gram: each device holds a row-block of x, all-gathers the
    column operand over ICI, computes its (n/p, n) tile with the fused local
    Gram kernel. Output rows stay sharded (ready for distributed solves)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(axis, None),
        # the transpose (grad) of the all_gather needs a reduce-scatter whose
        # replication can't be statically inferred — disable the static check
        check_vma=False,
    )
    def _gram(x_local):
        x_all = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
        return kernel_fn(x_local, x_all)

    return _gram(x)


def distributed_evidence(kernel, mesh, axis="tp"):
    """Return a jittable negative-log-evidence fn over row-sharded data.

    Gram rows are computed per-device (ICI all-gather of X — cheap: X is
    (n, d) with small d, vs the (n, n) Gram that never crosses chips until
    the factorization). The Cholesky itself currently gathers K (XLA GSPMD
    chooses the layout); a block-cyclic distributed Cholesky is the planned
    upgrade for n >> 16k.
    """

    def nll(params_dict, s, x, y):
        K = sharded_gram(
            lambda a, b: kernel.eval_params(params_dict, a, b), x, mesh, axis
        )
        n = x.shape[0]
        K = 0.5 * (K + K.T) + (s * s) * jnp.eye(n, dtype=K.dtype)
        L = chol_jittered(K)
        alpha = cho_solve(L, y)
        return 0.5 * (y.T @ alpha)[0, 0] + 0.5 * logdet_from_chol(L)

    return nll


def restart_farm(fn, n_restarts, mesh, axis="dp"):
    """vmap `fn` over a leading restart axis and shard that axis over the
    mesh — hyperparameter restarts / Langevin chains / acquisition starts
    each run on their own chip (the 64-restart Cox config = one call)."""
    vfn = jax.vmap(fn)

    def call(batched_args):
        sharded = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
            ),
            batched_args,
        )
        return vfn(*sharded)

    return call
