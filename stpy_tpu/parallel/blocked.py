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


def panel_step_strips(mesh: Mesh, axis: str, np_: int, nbe: int):
    """One donated panel step of the strip-held right-looking Cholesky —
    the capacity workhorse (VERDICT r2 item 3, r3 task 6).

    The matrix lives as k = np_/nbe SEPARATE column strips, each (np_, nbe)
    row-sharded P(axis, None). The factorization is a HOST loop of k calls
    to the one compiled program returned here, with the strip tuple DONATED
    each call: XLA aliases every input strip to its output (in-place at the
    buffer level), so per-device peak is n²/p (the strips) + the (np_, nbe)
    gathered panel + small workspace — measured 260 MB/device at n=16k p=8
    vs 341 MB for the single-jit in-place fori_loop variant (whose loop
    carry and program output are separate buffers; CPU and TPU buffer
    assignment both decline to alias a while-carry to a program output) and
    457 MB for the r3 (K, L) two-buffer version (exp_dist_capacity.py).

    Why the step is correct with a TRACED panel index j (one compile, not
    k): the gathered panel W_full is strict-below masked — zero at every
    global row < (j+1)·nbe — so `strip_r − Wb @ W_full[r-block]ᵀ` is an
    exact no-op for every finished strip r ≤ j, and the unmasked update of
    ALL strips needs no per-j program. Strip j itself is then swapped for
    the finished L column via a where on (r == j). Each strip is written
    as the fully-masked column (zeros above the diagonal block), so the
    final strips ARE clean L columns — no stale upper triangle, no final
    mask pass.

    Per panel j the communication is one (np_, nbe) all-gather — n² floats
    over the whole factorization, one ring pass of the matrix. The diagonal
    (nbe, nbe) block is psum-broadcast from its owner and factorized
    redundantly (nbe³ ≪ communication). FLOPs are the masked-variant n³
    (3x optimal): on this path HBM capacity is the binding constraint, not
    MXU time; use factorization="rec" when the problem fits. The k host
    dispatches cost ~31 ms each through the tunnel (k=16 at n=16k ⇒
    ~0.5 s) — noise against the factorization itself at capacity sizes.
    """
    p = mesh.shape[axis]
    nl = np_ // p
    k_panels = np_ // nbe

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None),) * k_panels + (P(),),
        out_specs=(P(axis, None),) * k_panels,
        check_vma=False,
    )
    def step_local(*args):
        S, j = args[:-1], args[-1]
        i = jax.lax.axis_index(axis)
        row0 = (i * nl).astype(jnp.int32)
        grows = row0 + jnp.arange(nl)
        c0 = (j * nbe).astype(jnp.int32)
        # select the active strip by traced j — serialized via a barrier
        # on the scalar predicate so the k masked reads chain instead of
        # tree-scheduling k concurrent (nl, nbe) products
        C = S[0] * (j == 0)
        for r in range(1, k_panels):
            pr, C = jax.lax.optimization_barrier((j == r, C))
            C = C + S[r] * pr
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
            jnp.zeros((nl, nbe), C.dtype),
            jnp.where(owner, Ljj, jnp.zeros_like(Ljj)),
            (off, jnp.int32(0)),
        )
        W_full = jax.lax.all_gather(Wb, axis, axis=0, tiled=True)
        out = []
        for r in range(k_panels):
            Wf_r = W_full[r * nbe:(r + 1) * nbe]
            upd = S[r] - Wb @ Wf_r.T          # exact no-op for r <= j
            out.append(jnp.where(j == r, Lcol, upd))
        return tuple(out)

    def step(strips, j):
        return step_local(*strips, jnp.asarray(j, jnp.int32))

    return jax.jit(step, donate_argnums=0), k_panels


def solve_strips_sharded(mesh: Mesh, axis: str, np_: int, nbe: int,
                         transpose: bool = False):
    """Panel-sequential triangular solve against a strip-held factor:
    L X = B (or Lᵀ X = B), B and X REPLICATED (np_, t) — O(n·t + n²/p)
    per-device memory, no full-matrix TriangularSolve (which XLA would
    replicate, see exp_dist_capacity). The panel loop is a fori_loop with
    the active strip selected by a masked sum over the tuple — NOT
    trace-time unrolled: with an unrolled loop XLA hoists all k(k+1)/2
    (nbe, nbe) strip slices to the program start (they depend only on the
    loop-invariant strips), materializing them CONCURRENTLY — measured
    548 MB temp at n=16k where the loop-carried form needs ~70 MB. The
    masked selection re-reads the strips once per panel (k·n²/p HBM
    traffic per device per solve, ~2 GB at n=16k — milliseconds at HBM
    rate, irrelevant next to the factorization).

    Forward: X_j = Ljj⁻¹ (B_j − Σ_r L[j-block, r-block] X_r) with the row
    blocks local to the panel owner, psum-broadcast per panel; X rows ≥
    the panel are still zero in the forward sweep, so the unmasked sum
    over ALL r is exact. Backward (transpose): the column strip below the
    panel is distributed, so the contraction Σ L[:, j-block]ᵀ X is a
    per-device partial GEMM + psum; X rows ≤ the panel are still zero in
    the backward sweep, so the unmasked local contraction is exact.
    """
    p = mesh.shape[axis]
    nl = np_ // p
    k_panels = np_ // nbe

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None),) * k_panels + (P(),),
        out_specs=P(),
        check_vma=False,
    )
    def solve_local(*args):
        S, B = args[:-1], args[-1]
        i = jax.lax.axis_index(axis)
        row0 = (i * nl).astype(jnp.int32)
        t = B.shape[1]

        def fwd_body(j, X):
            c0 = (j * nbe).astype(jnp.int32)
            owner = (c0 >= row0) & (c0 + nbe <= row0 + nl)
            off = jnp.clip(c0 - row0, 0, nl - nbe).astype(jnp.int32)
            acc = jnp.zeros((nbe, t), B.dtype)
            Ljj = jnp.zeros((nbe, nbe), B.dtype)
            for r in range(k_panels):
                # barrier-gate each strip read on the running accumulator
                # (via the SCALAR offset — gating the strip itself makes
                # XLA copy it): without this the scheduler hoists all k
                # (nbe, nbe) row blocks (and their products) to the top of
                # the body and holds them CONCURRENTLY — measured 188 MB
                # body temp at n=16k vs ~20 MB for the serialized chain.
                # Ljj rides the same serialized blk (a separate masked-sum
                # over the strips gets tree-scheduled: 132 MB, measured)
                off_r, acc, Ljj = jax.lax.optimization_barrier(
                    (off, acc, Ljj))
                blk = jax.lax.dynamic_slice(
                    S[r], (off_r, jnp.int32(0)), (nbe, nbe))
                acc = acc + blk @ jax.lax.dynamic_slice(
                    X, (jnp.int32(r * nbe), jnp.int32(0)), (nbe, t))
                Ljj = Ljj + blk * (j == r)
            rhs = jax.lax.dynamic_slice(B, (c0, jnp.int32(0)), (nbe, t))
            # acc includes blk_j @ X_j and later blocks, but X rows >= c0
            # are still zero — exact
            Xj = jax.scipy.linalg.solve_triangular(
                Ljj, rhs - acc, lower=True)
            Xj = jax.lax.psum(
                jnp.where(owner, Xj, jnp.zeros_like(Xj)), axis)
            return jax.lax.dynamic_update_slice(X, Xj, (c0, jnp.int32(0)))

        def bwd_body(jj, X):
            j = k_panels - 1 - jj
            c0 = (j * nbe).astype(jnp.int32)
            owner = (c0 >= row0) & (c0 + nbe <= row0 + nl)
            off = jnp.clip(c0 - row0, 0, nl - nbe).astype(jnp.int32)
            col = S[0] * (j == 0)
            for r in range(1, k_panels):
                col = col + S[r] * (j == r)
            Xl = jax.lax.dynamic_slice(X, (row0, jnp.int32(0)), (nl, t))
            acc = jax.lax.psum(col.T @ Xl, axis)
            Ljj = jax.lax.dynamic_slice(col, (off, jnp.int32(0)), (nbe, nbe))
            Ljj = jax.lax.psum(
                jnp.where(owner, Ljj, jnp.zeros_like(Ljj)), axis)
            rhs = jax.lax.dynamic_slice(B, (c0, jnp.int32(0)), (nbe, t))
            Xj = jax.scipy.linalg.solve_triangular(
                Ljj.T, rhs - acc, lower=False)
            return jax.lax.dynamic_update_slice(X, Xj, (c0, jnp.int32(0)))

        X0 = jnp.zeros((np_, t), B.dtype)
        body = bwd_body if transpose else fwd_body
        return jax.lax.fori_loop(0, k_panels, body, X0)

    def solve(strips, B):
        return solve_local(*strips, B)

    return solve


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

    def _build_gram_strips(self, n: int, np_: int, nbe: int):
        """shard_map Gram builder emitting k = np_/nbe column strips, each
        (np_/p, nbe) per device — the strip-held twin of `_build_gram_rows`
        (same O(n²/p) per-device peak; the strips land directly in the
        buffers the donated factor steps then update in place). Padding
        rows/cols (index ≥ n) are zeroed with a unit diagonal."""
        kernel = self.kernel_object
        params = self.kernel_object.params_dict
        axis = self.axis
        s2 = self.s ** 2
        k_panels = np_ // nbe

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(axis, None),),
            out_specs=(P(axis, None),) * k_panels,
            check_vma=False,
        )
        def build_strips(x_local):
            x_all = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            i = jax.lax.axis_index(axis)
            nl = x_local.shape[0]
            grows = i * nl + jnp.arange(nl)
            diagval = jnp.where(grows >= n, 1.0, s2) if np_ != n else s2
            outs = []
            for r in range(k_panels):
                gcols = r * nbe + jnp.arange(nbe)
                Kb = kernel.eval_params(params, x_local, x_all[r * nbe:(r + 1) * nbe])
                if np_ != n:
                    Kb = jnp.where(
                        (grows >= n)[:, None] | (gcols >= n)[None, :],
                        0.0, Kb)
                eq = (grows[:, None] == gcols[None, :]).astype(Kb.dtype)
                outs.append(Kb + eq * diagval)
            return tuple(outs)

        return build_strips

    def _panel_stages(self, n: int, np_: int):
        """The four compiled stages of the strip-held panels fit — build,
        donated factor step, fwd+bwd solve — exposed separately so capacity
        experiments can `.lower().compile()` each and report the max-stage
        `memory_analysis()` (exp_dist_capacity; the fit is k+2 dispatches,
        not one program, so per-device peak is the max stage)."""
        mesh, axis, nb = self.mesh, self.axis, self.nb
        p = mesh.shape[axis]
        # cap the panel width at ~np_/16 so the (np_, nbe) all-gather
        # transient stays a small fraction of the n²/p strips at every n
        # (at nbe = n/8 the gather alone equals the strips); floor of 128
        # keeps the MXU tiles efficient. More panels = more ~31 ms host
        # dispatches — noise on this capacity path.
        nbe = _panel_size(np_ // p, min(nb, max(128, np_ // 16)))
        build = jax.jit(self._build_gram_strips(n, np_, nbe))
        step, k_panels = panel_step_strips(mesh, axis, np_, nbe)
        fwd = solve_strips_sharded(mesh, axis, np_, nbe)
        bwd = solve_strips_sharded(mesh, axis, np_, nbe, transpose=True)

        def solve_y(strips, yr):
            ypad = jnp.pad(yr, ((0, np_ - n), (0, 0)))
            return bwd(strips, fwd(strips, ypad))

        return build, step, k_panels, jax.jit(solve_y), fwd, nbe

    def _make_fit_fn(self, n: int, np_: int):
        """Jitted (x_sharded, y) -> (L, alpha_padded) for a fixed problem
        size (rec/masked factorizations — the panels path is host-stepped,
        see `_panel_stages`)."""
        nb = self.nb
        build_rows = self._build_gram_rows(n, np_)

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

        # jit cache keyed by shape: the fit programs close over (n, np_),
        # so refits at a new n need fresh closures; same n reuses the
        # compiled programs
        if not hasattr(self, "_fit_cache"):
            self._fit_cache = {}
        if self.factorization == "panels":
            if (n, np_) not in self._fit_cache:
                self._fit_cache[(n, np_)] = self._panel_stages(n, np_)
            build, step, k_panels, solve_y, fwd, nbe = \
                self._fit_cache[(n, np_)]
            self._nbe, self._fwd = nbe, fwd
            strips = build(x_sh)
            for j in range(k_panels):        # donated: in-place at buffer level
                strips = step(strips, j)
            self.L = strips                   # tuple of (np_, nbe) L columns
            alpha = solve_y(strips, y_rep)
        else:
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
            fwd = self._fwd

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
