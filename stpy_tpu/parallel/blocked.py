"""Distributed dense exact-GP path: blocked Cholesky + blocked triangular
solve written on the GLOBAL array with sharding annotations, so XLA's SPMD
partitioner (GSPMD) inserts the ICI collectives.

SURVEY.md §2.11 / §5 / §7-stage-10: the reference has no parallelism at all;
the TPU framework's large-n story is "block-cyclic Gram tiles over the ICI
mesh, distributed blocked Cholesky, ring-style accumulation". This module is
that component. Design choice — instead of hand-writing a 2D block-cyclic
ScaLAPACK-style factorization inside `shard_map`, we express a masked
right-looking blocked Cholesky as plain jnp on the global (n, n) array and
shard it `P('tp', None)` (row blocks). Every step is then:

  * an (nb, nb) diagonal-block Cholesky (replicated — tiny),
  * one (n, nb) panel GEMM against the inverse-transposed diagonal factor
    (row-local, zero communication),
  * one rank-nb trailing update `A -= W_below @ W_below.T` whose right
    operand GSPMD all-gathers ((n·nb) floats per step → n² total over the
    factorization, the same volume as one ring pass of the matrix).

The masked full-matrix update does 3x the minimal n³/3 FLOPs, but they are
all dense GEMMs at full MXU rate with static shapes — on TPU that trades
favorably against the irregular panel indexing a FLOP-optimal variant needs,
and the point of this path is HBM capacity across chips (n = 64k+ needs
K and L sharded), not single-chip speed (use `GaussianProcess` there).

Parity: gives multi-chip capability the reference (single-process torch,
gauss_procc.py:136-177) never had.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stpy_tpu.linalg import tri_solve_blocked


def blocked_cholesky(K: jnp.ndarray, nb: int = 1024) -> jnp.ndarray:
    """Lower Cholesky factor of SPD `K` via masked right-looking block
    factorization — all heavy work is (n, nb) x (nb, n) GEMMs, so it runs
    unchanged on one chip or on a row-sharded global array over a mesh.

    Requires n % nb == 0 (pad with identity on the diagonal otherwise; see
    `chol_sharded` which handles padding).
    """
    n = K.shape[0]
    assert n % nb == 0, "blocked_cholesky requires n divisible by nb"
    k = n // nb
    rows = jnp.arange(n)

    def step(j, carry):
        A, L = carry
        # column strip j of the (partially updated) matrix
        C = jax.lax.dynamic_slice(A, (0, j * nb), (n, nb))
        Ajj = jax.lax.dynamic_slice(C, (j * nb, 0), (nb, nb))
        Ljj = jnp.linalg.cholesky(Ajj)
        # W = C Ljj^{-T}: valid for every row, garbage above the diagonal
        # block — masked out below. Row-local GEMM under row sharding.
        W = jax.scipy.linalg.solve_triangular(Ljj, C.T, lower=True).T
        below = (rows >= (j + 1) * nb).astype(K.dtype)[:, None]
        Wb = W * below                                   # strict-below panel
        # assemble the true L column block: zeros above, Ljj on the diagonal
        # block, Wb below
        col = Wb
        col = jax.lax.dynamic_update_slice(col, Ljj, (j * nb, 0))
        L = jax.lax.dynamic_update_slice(L, col, (0, j * nb))
        # trailing update touches only rows AND cols >= (j+1)*nb because Wb
        # is zero elsewhere
        A = A - Wb @ Wb.T
        return A, L

    _, L = jax.lax.fori_loop(0, k, step, (K, jnp.zeros_like(K)))
    return L


def _chol_rec_sharded(A, nb, spec, precision):
    """Trace-time divide-and-conquer Cholesky with sharding constraints at
    every level — the FLOP-optimal (n³/3) replacement for the masked
    right-looking `blocked_cholesky` (which does 3x the FLOPs).

    Under a row sharding P(axis, None), GSPMD lowers each level's Schur
    update S = A22 − L21ᵀ L21 as per-device partial GEMMs over the locally
    held rows of L21 followed by a reduce-scatter onto S's row shards — the
    communication shape of a 2-D block-cyclic trailing update, without
    hand-writing the ScaLAPACK bookkeeping in shard_map. Panel solves reuse
    the blocked GEMM substitution (`_tri_rec`), whose off-diagonal GEMMs
    contract over the sharded dimension the same way. Total collective
    volume ≈ Σ_level (n/2^ℓ)² ≈ n²/2 floats — one ring pass of the matrix,
    same as the masked variant, at a third of its FLOPs.
    """
    from stpy_tpu.linalg import _tri_rec

    n = A.shape[0]
    if n // nb <= 1:
        return jnp.linalg.cholesky(A)
    h = ((n // nb) // 2) * nb
    A11 = jax.lax.with_sharding_constraint(A[:h, :h], spec)
    L11 = _chol_rec_sharded(A11, nb, spec, precision)
    L21T = _tri_rec(L11, A[:h, h:], nb, precision)      # (h, n-h)
    L21T = jax.lax.with_sharding_constraint(L21T, spec)
    S = A[h:, h:] - jax.lax.dot(L21T.T, L21T, precision=precision)
    S = jax.lax.with_sharding_constraint(S, spec)
    L22 = _chol_rec_sharded(S, nb, spec, precision)
    top = jnp.concatenate([L11, jnp.zeros((h, n - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21T.T, L22], axis=1)
    return jax.lax.with_sharding_constraint(
        jnp.concatenate([top, bot], axis=0), spec
    )


def chol_sharded_rec(K: jnp.ndarray, mesh: Mesh, axis: str = "tp",
                     nb: int = 1024,
                     precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """FLOP-optimal distributed Cholesky of a row-sharded SPD matrix.

    Drop-in alternative to `chol_sharded` doing n³/3 instead of n³ FLOPs;
    see `_chol_rec_sharded` for the collective analysis. Pads to a multiple
    of nb (identity diagonal) so arbitrary n works.
    """
    Kp, n, pad = _pad_spd(K, nb)
    spec = NamedSharding(mesh, P(axis, None))
    Kp = jax.lax.with_sharding_constraint(Kp, spec)
    L = _chol_rec_sharded_jit(nb, spec, precision)(Kp)
    return L[:n, :n] if pad else L


@functools.lru_cache(maxsize=None)
def _chol_rec_sharded_jit(nb, spec, precision):
    # cache the jitted callable: a fresh functools.partial per call would
    # defeat jax.jit's trace cache and recompile every factorization
    return jax.jit(
        functools.partial(_chol_rec_sharded, nb=nb, spec=spec,
                          precision=precision),
        in_shardings=spec, out_shardings=spec,
    )


def _pad_spd(K: jnp.ndarray, nb: int):
    n = K.shape[0]
    pad = (-n) % nb
    if pad == 0:
        return K, n, 0
    Kp = jnp.zeros((n + pad, n + pad), K.dtype)
    Kp = Kp.at[:n, :n].set(K)
    Kp = Kp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
    return Kp, n, pad


def chol_sharded(K: jnp.ndarray, mesh: Mesh, axis: str = "tp",
                 nb: int = 1024) -> jnp.ndarray:
    """Cholesky of a global SPD matrix row-sharded over `mesh[axis]`.

    Returns L with the same `P(axis, None)` sharding. Pads to a multiple of
    nb (identity diagonal) so arbitrary n works.
    """
    Kp, n, pad = _pad_spd(K, nb)
    spec = NamedSharding(mesh, P(axis, None))
    Kp = jax.lax.with_sharding_constraint(Kp, spec)
    L = _chol_masked_jit(nb, spec)(Kp)
    return L[:n, :n] if pad else L


@functools.lru_cache(maxsize=None)
def _chol_masked_jit(nb, spec):
    return jax.jit(
        functools.partial(blocked_cholesky, nb=nb),
        in_shardings=spec, out_shardings=spec,
    )


class DistributedExactGP:
    """Exact GP whose Gram, Cholesky factor and predictive solves are
    row-sharded over a device mesh — the n ≫ single-chip-HBM dense path.

    fit: K = k(X, X) + s² I  (Gram computed row-sharded — each device
         evaluates its row block against replicated X), L = chol_sharded(K),
         alpha = L^{-T} L^{-1} y via the blocked GEMM substitution.
    predict: mean = K*ᵀ alpha, var = diag(K**) − ‖L^{-1} K*‖² column sums,
         with K* (n, t) row-sharded like K.

    All three phases are one jit each; collectives are whatever GSPMD
    inserts for the row-crossing slices (all-gathers of (nb, ·) panels).
    """

    def __init__(self, kernel_object, s: float = 0.1, mesh: Mesh | None = None,
                 axis: str = "tp", nb: int = 1024, factorization: str = "rec"):
        self.kernel_object = kernel_object
        self.s = s
        if mesh is None:
            mesh = Mesh(jax.devices(), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.nb = nb
        # "rec"   : FLOP-optimal recursive factorization (n³/3, default)
        # "masked": r1's masked right-looking variant (3x FLOPs, kept for
        #           comparison/benchmarks)
        if factorization not in ("rec", "masked"):
            raise ValueError(factorization)
        self.factorization = factorization
        self._spec = NamedSharding(mesh, P(axis, None))
        self._rep = NamedSharding(mesh, P())

    def fit_gp(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y).reshape(-1, 1)
        n = x.shape[0]
        nb = self.nb
        params = self.kernel_object.params_dict
        kernel = self.kernel_object

        x_rep = jax.device_put(x, self._rep)
        y_rep = jax.device_put(y, self._rep)

        def build_and_factor(xr, yr):
            nn = xr.shape[0]
            K = kernel.eval_params(params, xr, xr)
            K = K + (self.s ** 2) * jnp.eye(nn, dtype=K.dtype)
            Kp, _, _ = _pad_spd(K, nb)
            Kp = jax.lax.with_sharding_constraint(Kp, self._spec)
            if self.factorization == "rec":
                L = _chol_rec_sharded(
                    Kp, nb, self._spec, jax.lax.Precision.HIGHEST
                )
            else:
                L = blocked_cholesky(Kp, nb=nb)
            ypad = jnp.pad(yr, ((0, Kp.shape[0] - nn), (0, 0)))
            z = tri_solve_blocked(L, ypad, nb=nb)
            # backward solve via the blocked kernel on the reversed system:
            # L^T a = z  <=>  (J L J)ᵀ is lower … simpler: reuse XLA trisolve
            # for the single-RHS backward pass (cheap, (n,1)).
            a = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
            return L, a

        # jit once per instance: shapes are derived from the traced args, so
        # refits with the same n hit the trace cache instead of recompiling
        if not hasattr(self, "_fit"):
            self._fit = jax.jit(build_and_factor)
        self.L, alpha = self._fit(x_rep, y_rep)
        self.alpha = alpha[:n]
        self.x, self.y, self.n = x_rep, y_rep, n
        return self

    def mean_std(self, xtest):
        xtest = jnp.asarray(xtest)
        t = xtest.shape[0]
        n, nb = self.n, self.nb
        params = self.kernel_object.params_dict
        kernel = self.kernel_object

        def predict(L, alpha, xr, xt):
            Ks = kernel.eval_params(params, xr, xt)          # (n, t)
            npad = L.shape[0] - xr.shape[0]
            Ksp = jnp.pad(Ks, ((0, npad), (0, 0)))
            Ksp = jax.lax.with_sharding_constraint(Ksp, self._spec)
            mu = Ks.T @ alpha
            V = tri_solve_blocked(L, Ksp, nb=nb)             # (n+pad, t)
            kss = kernel.diag(xt, params)
            var = jnp.maximum(kss - jnp.sum(V * V, axis=0), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        if not hasattr(self, "_predict"):
            self._predict = jax.jit(predict)
        return self._predict(self.L, self.alpha, self.x,
                             jax.device_put(xtest, self._rep))
