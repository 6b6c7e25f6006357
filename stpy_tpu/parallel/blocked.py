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


def _panel_size(nl: int, nb: int) -> int:
    """Largest panel width ≤ nb that divides the per-device row count."""
    q = -(-nl // nb)
    while nl % q:
        q += 1
    return nl // q


def chol_panels_sharded(mesh: Mesh, axis: str, np_: int, nb: int):
    """shard_map right-looking panel Cholesky with EXPLICIT O(n²/p) local
    state — the capacity workhorse (VERDICT r2 item 3).

    Why not GSPMD: expressing the recursion on the global array and
    constraining shardings (`_chol_rec_sharded`) leaves the partitioner free
    to replicate intermediates, and it does — measured ~n² temp per device
    at n=16k (exp_dist_capacity.py), defeating the point of the distributed
    path. Here each device owns its (n/p, n) row block, and per panel j:

      * the (nb, nb) diagonal block is psum-broadcast from its owner and
        factorized redundantly (nb³ ≪ communication cost);
      * the panel solve is a row-local (n/p, nb) GEMM;
      * the trailing update K_local −= W_local · W_fullᵀ all-gathers ONE
        (n, nb) panel — n² floats over the whole factorization, one ring
        pass of the matrix, freed each iteration.

    Per-device peak = 2·n²/p (K_local + L_local) + n·nb transient. FLOPs
    are the masked-variant n³ (3x optimal): on this path HBM capacity is
    the binding constraint, not MXU time; use factorization="rec" when the
    problem fits.
    """
    p = mesh.shape[axis]
    nl = np_ // p
    nbe = _panel_size(nl, nb)
    k_panels = np_ // nbe

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None),), out_specs=P(axis, None),
        check_vma=False,
    )
    def chol_local(K_local):
        i = jax.lax.axis_index(axis)
        row0 = (i * nl).astype(jnp.int32)
        grows = row0 + jnp.arange(nl)

        def body(j, carry):
            K_loc, L_loc = carry
            c0 = (j * nbe).astype(jnp.int32)
            C = jax.lax.dynamic_slice(K_loc, (jnp.int32(0), c0), (nl, nbe))
            owner = (c0 >= row0) & (c0 + nbe <= row0 + nl)
            off = jnp.clip(c0 - row0, 0, nl - nbe).astype(jnp.int32)
            cand = jax.lax.dynamic_slice(C, (off, jnp.int32(0)), (nbe, nbe))
            Ajj = jax.lax.psum(
                jnp.where(owner, cand, jnp.zeros_like(cand)), axis
            )
            Ljj = jnp.linalg.cholesky(Ajj)
            W = jax.scipy.linalg.solve_triangular(Ljj, C.T, lower=True).T
            below = (grows >= c0 + nbe)[:, None]
            Wb = jnp.where(below, W, 0.0)
            Lcol = Wb + jax.lax.dynamic_update_slice(
                jnp.zeros((nl, nbe), K_loc.dtype),
                jnp.where(owner, Ljj, jnp.zeros_like(Ljj)),
                (off, jnp.int32(0)),
            )
            L_loc = jax.lax.dynamic_update_slice(L_loc, Lcol, (jnp.int32(0), c0))
            W_full = jax.lax.all_gather(Wb, axis, axis=0, tiled=True)
            K_loc = K_loc - Wb @ W_full.T
            return K_loc, L_loc

        _, L_local = jax.lax.fori_loop(
            0, k_panels, body, (K_local, jnp.zeros_like(K_local))
        )
        return L_local

    return chol_local, nbe


def solve_panels_sharded(mesh: Mesh, axis: str, np_: int, nbe: int,
                         transpose: bool = False):
    """Panel-sequential triangular solve against a row-sharded factor:
    L X = B (or Lᵀ X = B), B and X REPLICATED (np_, t) — O(n·t + n²/p)
    per-device memory, no full-matrix TriangularSolve (which XLA would
    replicate, see exp_dist_capacity).

    Forward: X_j = Ljj⁻¹ (B_j − L[j, :] X·1[cols<j·nb]) with the row strip
    local to the owner, psum-broadcast per panel. Backward (transpose):
    the column strip below the panel is distributed, so the contraction
    Σ_r L[r, j]ᵀ X_r is a per-device partial GEMM + psum.
    """
    p = mesh.shape[axis]
    nl = np_ // p
    k_panels = np_ // nbe

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P()), out_specs=P(),
        check_vma=False,
    )
    def solve_local(L_local, B):
        i = jax.lax.axis_index(axis)
        row0 = (i * nl).astype(jnp.int32)
        grows = row0 + jnp.arange(nl)
        t = B.shape[1]

        def fwd_body(j, X):
            c0 = (j * nbe).astype(jnp.int32)
            owner = (c0 >= row0) & (c0 + nbe <= row0 + nl)
            off = jnp.clip(c0 - row0, 0, nl - nbe).astype(jnp.int32)
            strip = jax.lax.dynamic_slice(L_local, (off, jnp.int32(0)), (nbe, np_))
            Ljj = jax.lax.dynamic_slice(strip, (jnp.int32(0), c0), (nbe, nbe))
            rhs = jax.lax.dynamic_slice(B, (c0, jnp.int32(0)), (nbe, t))
            # columns < c0 of the strip already hold final L; X rows >= c0
            # are still zero, so the full-width GEMM needs no masking
            acc = strip @ X
            Xj = jax.scipy.linalg.solve_triangular(
                Ljj, rhs - acc, lower=not transpose
            )
            Xj = jax.lax.psum(
                jnp.where(owner, Xj, jnp.zeros_like(Xj)), axis
            )
            return jax.lax.dynamic_update_slice(X, Xj, (c0, jnp.int32(0)))

        def bwd_body(jj, X):
            j = k_panels - 1 - jj
            c0 = (j * nbe).astype(jnp.int32)
            owner = (c0 >= row0) & (c0 + nbe <= row0 + nl)
            off = jnp.clip(c0 - row0, 0, nl - nbe).astype(jnp.int32)
            col = jax.lax.dynamic_slice(L_local, (jnp.int32(0), c0), (nl, nbe))
            # rows strictly below the panel (distributed): partial + psum.
            # X rows <= c0+nbe are still zero in the backward sweep, so the
            # unmasked local contraction is exact
            Xl = jax.lax.dynamic_slice(X, (row0, jnp.int32(0)), (nl, t))
            part = col.T @ Xl
            acc = jax.lax.psum(part, axis)
            Ljj = jax.lax.dynamic_slice(col, (off, jnp.int32(0)), (nbe, nbe))
            Ljj = jax.lax.psum(
                jnp.where(owner, Ljj, jnp.zeros_like(Ljj)), axis
            )
            rhs = jax.lax.dynamic_slice(B, (c0, jnp.int32(0)), (nbe, t))
            Xj = jax.scipy.linalg.solve_triangular(
                Ljj.T, rhs - acc, lower=False
            )
            return jax.lax.dynamic_update_slice(X, Xj, (c0, jnp.int32(0)))

        X0 = jnp.zeros((np_, t), B.dtype)
        if transpose:
            return jax.lax.fori_loop(0, k_panels, bwd_body, X0)
        return jax.lax.fori_loop(0, k_panels, fwd_body, X0)

    return solve_local


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
                 axis: str = "tp", nb: int = 1024,
                 factorization: str = "panels"):
        self.kernel_object = kernel_object
        self.s = s
        if mesh is None:
            mesh = Mesh(jax.devices(), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.nb = nb
        # "panels": shard_map panel factorization + panel solves with
        #           EXPLICIT O(n²/p) per-device state (default — this path
        #           exists for HBM capacity; measured in exp_dist_capacity)
        # "rec"   : FLOP-optimal GSPMD recursion (n³/3) — faster when the
        #           problem fits, but the partitioner replicates
        #           intermediates (~n²/device measured)
        # "masked": r1's masked right-looking GSPMD variant (3x FLOPs)
        if factorization not in ("panels", "rec", "masked"):
            raise ValueError(factorization)
        self.factorization = factorization
        self._spec = NamedSharding(mesh, P(axis, None))
        self._rep = NamedSharding(mesh, P())

    def _padded_n(self, n: int) -> int:
        """Pad target: divisible by nb (blocked factorization) AND by the
        mesh extent (row sharding)."""
        import math

        p = self.mesh.shape[self.axis]
        step = self.nb * p // math.gcd(self.nb, p)
        return -(-n // step) * step

    def _build_gram_rows(self, n: int, np_: int):
        """shard_map Gram builder: each device evaluates ONLY its own
        (np_/p, np_) row block k(x_local, x_all) — per-device peak is
        O(n²/p) by construction, instead of relying on GSPMD to
        back-propagate the post-hoc sharding constraint through a full
        (n, n) eval (r2's approach; VERDICT r2 item 3 / weak #2). Padding
        rows/cols (index ≥ n) are zeroed with a unit diagonal so the
        factorization is well-posed at any n."""
        kernel = self.kernel_object
        params = self.kernel_object.params_dict
        axis = self.axis
        s2 = self.s ** 2

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(axis, None),), out_specs=P(axis, None),
            check_vma=False,
        )
        def build_rows(x_local):
            x_all = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            K_rows = kernel.eval_params(params, x_local, x_all)
            i = jax.lax.axis_index(axis)
            nl = x_local.shape[0]
            rows = jnp.arange(nl)
            grows = i * nl + rows                      # global row ids
            if np_ == n:
                # no padding: skip the mask (saves an (n/p, n) transient —
                # matters when 2·n²/p already fills most of HBM)
                return K_rows.at[rows, grows].add(s2)
            pad_row = (grows >= n)[:, None]
            pad_col = (jnp.arange(np_) >= n)[None, :]
            K_rows = jnp.where(pad_row | pad_col, 0.0, K_rows)
            diag = K_rows[rows, grows]
            return K_rows.at[rows, grows].set(
                jnp.where(grows >= n, 1.0, diag + s2)
            )

        return build_rows

    def _make_fit_fn(self, n: int, np_: int):
        """Jitted (x_sharded, y) -> (L, alpha_padded) for a fixed problem
        size — exposed so capacity experiments can `.lower().compile()` it
        and read `memory_analysis()` without running (exp_dist_capacity)."""
        nb = self.nb
        build_rows = self._build_gram_rows(n, np_)
        mesh, axis = self.mesh, self.axis

        if self.factorization == "panels":
            chol_local, nbe = chol_panels_sharded(mesh, axis, np_, nb)
            self._nbe = nbe
            fwd = solve_panels_sharded(mesh, axis, np_, nbe)
            bwd = solve_panels_sharded(mesh, axis, np_, nbe, transpose=True)

            def build_and_factor(xs, yr):
                Kp = build_rows(xs)
                L = chol_local(Kp)
                ypad = jnp.pad(yr, ((0, np_ - n), (0, 0)))
                return L, bwd(L, fwd(L, ypad))

            return jax.jit(build_and_factor)

        def build_and_factor(xs, yr):
            Kp = build_rows(xs)
            if self.factorization == "rec":
                L = _chol_rec_sharded(
                    Kp, nb, self._spec, jax.lax.Precision.HIGHEST
                )
            else:
                L = blocked_cholesky(Kp, nb=nb)
            ypad = jnp.pad(yr, ((0, np_ - n), (0, 0)))
            z = tri_solve_blocked(L, ypad, nb=nb)
            # backward solve through the blocked GEMM recursion too: XLA's
            # full-matrix TriangularSolve does not partition and would
            # all-gather the whole sharded L to every device (measured:
            # +~2 GB/device replicated temp at n=16k, exp_dist_capacity)
            from stpy_tpu.linalg import _tri_rec_upper

            a = _tri_rec_upper(L.T, z, nb, jax.lax.Precision.HIGHEST)
            return L, a

        return jax.jit(build_and_factor)

    def fit_gp(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y).reshape(-1, 1)
        n = x.shape[0]
        np_ = self._padded_n(n)

        x_pad = jnp.pad(x, ((0, np_ - n), (0, 0)))
        x_sh = jax.device_put(x_pad, self._spec)
        y_rep = jax.device_put(y, self._rep)

        # jit cache keyed by shape: the fit fn closes over (n, np_), so
        # refits at a new n need a fresh closure; same n reuses the
        # compiled program
        if not hasattr(self, "_fit_cache"):
            self._fit_cache = {}
        if (n, np_) not in self._fit_cache:
            self._fit_cache[(n, np_)] = self._make_fit_fn(n, np_)
        self.L, alpha = self._fit_cache[(n, np_)](x_sh, y_rep)
        self.alpha = alpha[:n]
        self.x, self.y, self.n = x_sh, y_rep, n
        self._np = np_
        return self

    def mean_std(self, xtest):
        xtest = jnp.asarray(xtest)
        n, nb, np_ = self.n, self.nb, self._np
        params = self.kernel_object.params_dict
        kernel = self.kernel_object
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis, None),
            check_vma=False,
        )
        def build_ks(x_local, xt):
            # row-sharded cross-Gram: each device evaluates only its
            # (np_/p, t) block; padding rows (global id >= n) zeroed
            Ks_l = kernel.eval_params(params, x_local, xt)
            i = jax.lax.axis_index(axis)
            nl = x_local.shape[0]
            grows = i * nl + jnp.arange(nl)
            return jnp.where((grows >= n)[:, None], 0.0, Ks_l)

        if self.factorization == "panels":
            fwd = solve_panels_sharded(self.mesh, axis, np_, self._nbe)

            def vsolve(L, Ksp):
                return fwd(L, Ksp)
        else:

            def vsolve(L, Ksp):
                return tri_solve_blocked(L, Ksp, nb=nb)

        def predict(L, alpha, xs, xt):
            Ksp = build_ks(xs, xt)                           # (np_, t)
            apad = jnp.pad(alpha, ((0, np_ - n), (0, 0)))
            mu = Ksp.T @ apad                                # pad rows are 0
            V = vsolve(L, Ksp)                               # (np_, t)
            kss = kernel.diag(xt, params)
            var = jnp.maximum(kss - jnp.sum(V * V, axis=0), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        if not hasattr(self, "_predict_cache"):
            self._predict_cache = {}
        pred = self._predict_cache.setdefault(
            (n, np_), jax.jit(predict)
        )
        return pred(self.L, self.alpha, self.x,
                    jax.device_put(xtest, self._rep))
