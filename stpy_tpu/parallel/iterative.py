"""Iterative large-n GP inference over a device mesh: conjugate gradients
with row-sharded Gram matvecs and block-Jacobi preconditioning.

This is the n >> 16k path (SURVEY.md §7 stage 10): instead of a distributed
Cholesky, solves (K + σ²I) x = b with
  * the Gram matrix K row-sharded over the 'tp' mesh axis (each device owns
    an (n/p, n) tile built by the fused local Gram kernel after an ICI
    all-gather of X — X is (n, d) with small d, so the collective is cheap),
  * CG matvecs as shard_map GEMVs (row-local GEMV + no cross-device
    reduction needed: rows are partitioned),
  * a block-Jacobi preconditioner from each device's diagonal block
    Cholesky.
Memory per device is O(n²/p) so n scales with the mesh. The same machinery
powers posterior mean/variance prediction (exact block-PCG per test
column, or Hutchinson probes for very large test sets — `mean_std`),
pathwise sampling (`sample_pathwise`), SLQ logdet (parallel/slq.py), and
the matrix-free evidence hyperfit (`optimize_params` → parallel/bbmm.py).
"""

from __future__ import annotations

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stpy_tpu.config import as_array
from stpy_tpu.linalg import chol_jittered, cho_solve


def cg_solve(matvec, b, M_inv=None, tol=1e-8, maxiter=1000,
             stall_window="auto"):
    """Preconditioned conjugate gradients; jit-safe while_loop. Returns
    (x, iterations, residual_norm).

    Stagnation stop: a tol below the f32 matvec noise floor (~sqrt(n)·eps
    relative — at n=65k that is ~1e-5, measured as the r4 d=8 sum-kernel
    stall at 1.3e-5) makes the residual wander around its floor forever.
    Every `stall_window` iterations the loop checks that ‖r‖² at least
    HALVED since the last checkpoint and exits otherwise. The factor-2
    bar is far below any genuinely converging solve (even a 638-iteration
    ill-conditioned f32 solve sheds ~10x in ‖r‖² per 100 iterations —
    staircase plateaus included) but is never met while bouncing around
    the noise floor. Callers detect the case as
    (it < maxiter and residual > tol).

    "auto" = 100 for f32 systems, OFF in f64 (CPU x64 runs): f64 CG on
    ill-conditioned spectra can legitimately plateau for hundreds of
    iterations before dropping — there is no noise floor anywhere near
    typical tols. Pass an int to force a window, None to disable."""
    if M_inv is None:
        M_inv = lambda r: r
    b = jnp.asarray(b)
    if stall_window == "auto":
        stall_window = 100 if b.dtype == jnp.float32 else None
    win = (1 << 30) if stall_window is None else int(stall_window)
    bnorm = jnp.linalg.norm(b)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_inv(r0)
    p0 = z0

    def cond(state):
        x, r, z, p, rz, it, ckpt, since, stop = state
        return (jnp.sqrt(jnp.vdot(r, r).real) > tol * bnorm) \
            & (it < maxiter) & jnp.logical_not(stop)

    def body(state):
        x, r, z, p, rz, it, ckpt, since, stop = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        rr = jnp.vdot(r, r).real
        at_ckpt = since + 1 >= win
        stop = at_ckpt & (rr > 0.5 * ckpt)
        ckpt = jnp.where(at_ckpt, rr, ckpt)
        since = jnp.where(at_ckpt, 0, since + 1)
        return x, r, z, p, rz_new, it + 1, ckpt, since, stop

    state = (x0, r0, z0, p0, jnp.vdot(r0, z0), jnp.asarray(0),
             jnp.vdot(r0, r0).real, jnp.asarray(0), jnp.asarray(False))
    x, r, _, _, _, it, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x, it, jnp.linalg.norm(r) / bnorm


def cg_solve_block(matmat, B, M_inv=None, tol=1e-8, maxiter=1000,
                   stall_window="auto"):
    """CG on r independent right-hand sides simultaneously — all inner
    products are per-column, the matvec is one BLOCK product (pairs with
    `make_lazy_matmat`: r ≤ 128 RHS cost ~one fused Gram pass). Converged
    columns freeze (zero step) while the rest continue. Optional `M_inv`
    (applied to the (n, r) residual block — e.g. the pivoted-Cholesky
    preconditioner) turns this into block PCG. Returns (X, iters)."""
    B = jnp.asarray(B)
    if stall_window == "auto":
        stall_window = 100 if B.dtype == jnp.float32 else None
    win = (1 << 30) if stall_window is None else int(stall_window)
    precond = M_inv is not None
    if M_inv is None:
        M_inv = lambda r: r
    bnorm = jnp.linalg.norm(B, axis=0)
    x0 = jnp.zeros_like(B)
    z0 = M_inv(B)
    rz0 = jnp.sum(B * z0, axis=0)
    rr0 = jnp.sum(B * B, axis=0)

    def cond(state):
        x, r, p, rz, rr, it, ckpt, since, stop = state
        return jnp.any(jnp.sqrt(rr) > tol * bnorm) & (it < maxiter) \
            & jnp.logical_not(stop)

    def body(state):
        x, r, p, rz, rr, it, ckpt, since, stop = state
        Ap = matmat(p)
        denom = jnp.sum(p * Ap, axis=0)
        active = jnp.sqrt(rr) > tol * bnorm
        alpha = jnp.where(active, rz / jnp.where(denom == 0, 1.0, denom), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r) if precond else r
        rz_new = jnp.sum(r * z, axis=0)
        rr_new = jnp.sum(r * r, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta * p
        # stagnation stop (see cg_solve): the worst still-active column's
        # relative ‖r‖² must at least halve per `stall_window` iterations,
        # else every active column sits at its f32 matvec noise floor
        worst = jnp.max(jnp.where(active, rr_new / bnorm2, 0.0))
        at_ckpt = since + 1 >= win
        stop = at_ckpt & (worst > 0.5 * ckpt)
        ckpt = jnp.where(at_ckpt, worst, ckpt)
        since = jnp.where(at_ckpt, 0, since + 1)
        return x, r, p, rz_new, rr_new, it + 1, ckpt, since, stop

    bnorm2 = jnp.maximum(bnorm * bnorm, 1e-30)
    state = (x0, B, z0, rz0, rr0, jnp.asarray(0),
             jnp.max(rr0 / bnorm2), jnp.asarray(0), jnp.asarray(False))
    x, r, _, _, _, it, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x, it


def cg_solve_block_segmented(matmat, B, M_inv=None, tol=1e-8,
                             maxiter=1000, segment=100):
    """Block CG as a HOST loop of bounded-length device programs.

    A single while_loop running hundreds of 65k-scale block products is
    one XLA program executing for minutes — measured to kill the TPU
    worker through this environment's tunnel ("TPU worker process
    crashed or restarted", r4: the n=65,536 t=1024 exact-variance path;
    30-iteration programs pass, 500-iteration programs die while eager
    sequences of the same kernels run fine —
    benchmarks/exp_r4_65k_crash_isolate*.py). This wrapper runs CG in
    `segment`-iteration device programs and restarts from the current
    iterate on host: one extra block product + one scalar readback per
    segment (~1% overhead at these sizes), worst-case program length
    bounded by `segment` products. Warm restart loses the Krylov
    momentum at segment boundaries — a few extra iterations, not a
    correctness change. Eager-only (host control flow); the variance
    path calls it eagerly. Returns (X, total_iterations)."""
    B = jnp.asarray(B)
    bnorm = jnp.linalg.norm(B, axis=0)
    bnorm_safe = jnp.maximum(bnorm, 1e-30)
    X = jnp.zeros_like(B)
    total = 0
    best = (float("inf"), X)
    prev_worst = float("inf")
    while total < maxiter:
        R = B - matmat(X) if total else B
        worst = float(jnp.max(jnp.linalg.norm(R, axis=0) / bnorm_safe))
        if worst < best[0]:
            best = (worst, X)
        if worst <= tol:
            break
        if worst > 0.5 * prev_worst:
            # segment-level stagnation: at the f32 floor a restart
            # SOLVES NOISE (R is mostly matvec error) and pushes X away
            # from the best iterate — stop unless the last segment at
            # least halved the worst column's relative residual
            break
        prev_worst = worst
        dX, it = cg_solve_block(
            matmat, R, M_inv=M_inv, tol=tol,
            maxiter=min(segment, maxiter - total),
            # the auto window (100) can never fire inside a
            # `segment`-length program; half-segment keeps in-segment
            # floor detection alive
            stall_window=max(25, segment // 2),
        )
        X = X + dX
        total += int(it)
        if int(it) == 0:
            break
    return best[1] if best[0] < float("inf") else X, total


def cg_solve_segmented(matvec, b, M_inv=None, tol=1e-8, maxiter=1000,
                       segment=100):
    """Single-RHS adapter over `cg_solve_block_segmented` (host loop of
    bounded device programs — see that docstring for why). Returns
    (x, iterations, residual_norm) like `cg_solve`; the residual is
    recomputed with one extra matvec."""
    b = jnp.asarray(b).reshape(-1)
    X, it = cg_solve_block_segmented(
        lambda V: matvec(V[:, 0])[:, None], b[:, None], M_inv=None
        if M_inv is None else (lambda R: M_inv(R[:, 0])[:, None]),
        tol=tol, maxiter=maxiter, segment=segment,
    )
    x = X[:, 0]
    res = jnp.linalg.norm(b - matvec(x)) / jnp.maximum(
        jnp.linalg.norm(b), 1e-30)
    return x, it, res


def resolve_precond_rank(rank, n: int) -> int:
    """Resolve a `precond_rank` setting ("auto" or int) for an n-point fit.

    The auto schedule is the measured rank-vs-iterations table from the
    r3 65k study (benchmarks/RESULTS.md "rank-monotone" row): n ≤ 16,384
    runs unpreconditioned (every 16k benchmark converges without one —
    building a rank-r preconditioner there only adds an O(n·r) setup), and
    larger n gets the shipped rank-512 Rayleigh-Nyström construction
    (65,536-point sum-kernel PCG: 96 iterations to ≤8e-7 where
    unpreconditioned CG stalls at 4.7e-2; rank 2048/4096 converge in
    37/30 iterations but cost 4-8x the setup and memory — 512 is the knee
    of wall-clock at this scale)."""
    if rank != "auto":
        return int(rank)
    return 0 if n <= 16384 else 512


def pivoted_cholesky_kernel(kernel_object, x, rank, params_dict=None):
    """Partial pivoted Cholesky of the kernel Gram, MATRIX-FREE: returns
    Lm of shape (rank, n) with K ≈ Lmᵀ Lm using only `rank` kernel COLUMN
    evaluations and O(n·rank) memory — never a dense Gram.

    This is the BBMM preconditioner construction (GPyTorch's recipe): the
    greedy pivot (largest residual diagonal) gives the best rank-r
    Nyström-type approximation available from column access, and
    (σ²I + LmᵀLm)⁻¹ applied via Woodbury is an excellent CG preconditioner
    for smooth kernels whose spectrum decays fast. Works for ANY
    KernelFunction (column eval goes through eval_params). Runs under jit
    (fori over a static rank, dynamic-slice column picks)."""
    pd = params_dict or kernel_object.params_dict
    x = jnp.asarray(x)
    n, dx = x.shape
    rank = int(min(rank, n))
    diag0 = kernel_object.diag(x, pd).reshape(-1)

    def body(i, carry):
        Lm, d = carry
        p = jnp.argmax(d).astype(jnp.int32)
        xp = jax.lax.dynamic_slice(x, (p, jnp.int32(0)), (1, dx))
        col = kernel_object.eval_params(pd, x, xp).reshape(-1)
        col = col - Lm[:, p] @ Lm            # rows >= i are still zero
        piv = jnp.sqrt(jnp.maximum(d[p], 1e-30))
        l = col / piv
        Lm = Lm.at[i].set(l)
        d = jnp.maximum(d - l * l, 0.0)
        d = d.at[p].set(0.0)                 # never re-pick a pivot
        return Lm, d

    Lm0 = jnp.zeros((rank, n), x.dtype)
    Lm, _ = jax.lax.fori_loop(0, rank, body, (Lm0, diag0))
    return Lm


def lowrank_eigen_precond(B, noise):
    """SPD apply of (BBᵀ + σ²I)⁻¹ in EIGENFORM for a low-rank factor B
    (n, r): eigendecompose the small Gram BᵀB = Q Λ Qᵀ, lift U = B Q Λ^{-½},
    then  M⁻¹v = (v − U diag(λ/(λ+σ²)) Uᵀv)/σ².

    Why not Cholesky-Woodbury on (σ²I + BᵀB): that small matrix has
    condition λmax/σ² — ~7e5 for a 65k-point smooth kernel at σ=0.2 —
    and its f32 factor-solve error (u·κ ≈ 7%) makes the implied M⁻¹
    effectively indefinite, which BREAKS CG (measured: the 65k sum-kernel
    PCG went from a 4.7e-2 stall to 2.2e-1, r3 batch C4).

    Construction is QR-FIRST, not an eigh-and-lift of BᵀB: the lift
    U = B·Q·λ^{-1/2} carries eps·λmax/λ cross-talk between eigenpairs,
    and λmax grows ~linearly with n — at n=8k (λmax/σ² ≈ 2e5) that noise
    is ~1e-2 and PCG converges in 13 iters, at n=65k (λmax/σ² ≈ 1.6e6)
    the small-λ columns are O(1) WRONG and PCG is actively harmed
    (residual 1.9 after 400 iters, r3 batch H — on CPU and TPU alike;
    the earlier "TPU-only" framing was an n=8k-CPU vs n=65k-TPU
    comparison). Householder QR of B is backward-stable REGARDLESS of
    conditioning: U = Q_qr·V with V the eigenvectors of the small
    well-scaled RRᵀ is orthonormal to ~eps, so M⁻¹ stays SPD and
    accurate at any κ. Junk near-null eigenvalues (landmark count above
    the kernel's numerical rank) get coef ≈ λ/σ² → 0 — harmless with an
    orthonormal U. Apply cost: two (n, r) GEMMs; construction one
    (n, r) QR + one (r, r) eigh."""
    Qn, R = jnp.linalg.qr(B)                    # (n, r), (r, r)
    lam, V = jnp.linalg.eigh(R @ R.T)           # eigenvalues of BᵀB
    U = Qn @ V                                  # orthonormal at any κ
    return _eigenform_apply(U, lam, noise)


def _eigenform_apply(U, lam, noise):
    """Shared SPD eigenform apply M⁻¹v = (v − U diag(λ/(λ+σ²)) Uᵀv)/σ²
    for an (approximately) orthonormal U and eigenvalue estimates lam.

    SPD deflation cap: once σ²/λ drops below U's f32 orthonormality
    error, the exact coefficient makes I − U·coef·Uᵀ indefinite and CG
    breaks outright — cap the deflation at 1 − 256·eps so the apply
    keeps a positive margin on hardware (bounds the preconditioned
    condition number at ~256·eps·λmax/σ² instead of 1; measured-on-
    hardware safety constant, r3 batch N — keep this the ONLY copy)."""
    lam = jnp.maximum(lam, 0.0)
    s2 = noise * noise
    cmax = 1.0 - 256.0 * float(jnp.finfo(jnp.asarray(U).dtype).eps)
    coef = jnp.minimum(lam / (lam + s2), cmax)

    def M_inv(rhs):
        rhs2 = rhs if rhs.ndim == 2 else rhs[:, None]
        t = U.T @ rhs2
        out = ((rhs2 - U @ (coef[:, None] * t)) / s2).astype(rhs.dtype)
        return out if rhs.ndim == 2 else out.reshape(rhs.shape)

    return M_inv


def make_pivchol_precond(Lm, noise):
    """Preconditioner companion of `pivoted_cholesky_kernel`: SPD eigenform
    apply of (LmᵀLm + σ²I)⁻¹ (see `lowrank_eigen_precond` for why not
    Cholesky-Woodbury). Accepts (n,) vectors or (n, r) blocks."""
    return lowrank_eigen_precond(Lm.T, noise)


def _blocked_k_apply(matmat, noise, block):
    """K·V from the lazy-path convention matmat ((K + σ²I)·V): σ² is
    subtracted, and wide V is fed through in `block`-column slabs (the
    fused Gram matmat's RHS budget)."""
    s2 = noise * noise

    def k_apply(V):
        outs = []
        for c0 in range(0, V.shape[1], block):
            blk = V[:, c0:c0 + block]
            outs.append(matmat(blk) - s2 * blk)
        return jnp.concatenate(outs, axis=1)

    return k_apply


def _rayleigh_compress_precond(Y, k_apply, noise):
    """SPD apply of (K_r + σ²I)⁻¹ from the Rayleigh compression of K onto
    a sketch Y — the junk-proof eigenvalue construction.

    Why (after pivoted Cholesky and column Nyström): any scheme that
    builds a low-rank factor B by *inverting* a small matrix (Nyström's
    B = C·W^{-1/2}, pivchol's column scaling) amplifies the near-null
    directions of that small matrix. QR-first lifting fixes U's
    ORTHONORMALITY at any κ (see lowrank_eigen_precond), but the
    EIGENVALUES paired with those directions are still estimated from the
    amplified factor — at n=65k the rank-2048/4096 compressions carried
    NEGATIVE tail estimates (-1.7e-4/-9.0e-4 against σ² = 4e-2, r3 batch
    K) and the rank sweep went non-monotone (512 converges, 2048 stalls,
    4096 converges — batch H2). Here there is no inverse anywhere:
    orthonormal basis Q = qr(Y), compression T = QᵀKQ (eigh(T) interlaces
    K's true spectrum, so junk-large estimates are impossible beyond
    matvec noise), U = Q·V. Returns the eigenform apply
    M⁻¹v = (v − U diag(λ/(λ+σ²)) Uᵀv)/σ², SPD by construction.

    Two f32 safeguards make "SPD by construction" hold ON HARDWARE, not
    just in exact arithmetic (both measured necessary, r3 batch N):
      * a SECOND QR pass — one Householder pass leaves QᵀQ−I ~ 1.4e-5 at
        n=65k f32 (batch K), and "twice is enough" brings it to ~eps;
      * the DEFLATION CAP in `_eigenform_apply` — whenever σ²/λ < the
        orthonormality error of U, the exact coefficient puts the
        deflated direction BELOW the noise floor of I − U·coef·Uᵀ and
        the apply goes indefinite (top eigendirections of the
        preconditioned system measured at −0.2), which breaks CG
        outright."""
    Q, _ = jnp.linalg.qr(Y)
    Q, _ = jnp.linalg.qr(Q)
    Z = k_apply(Q)
    T = Q.T @ Z
    lam, V = jnp.linalg.eigh(0.5 * (T + T.T))
    return _eigenform_apply(Q @ V, lam, noise)


def rayleigh_nystrom_precond(C, matmat, noise, *, block=128):
    """Landmark-sketch Rayleigh EVD preconditioner — THE large-n default.

    Range basis from the landmark cross-Gram C = K[:, idx] (kernel Gram
    columns are a far better rank-r range basis than a Gaussian sketch
    when the spectrum decays slowly: at n=65k/rank=512 the sum-kernel PCG
    converges in ~65 iters from the landmark range where the one-pass
    Gaussian sketch of the same rank left CG STALLED — its Rayleigh-Ritz
    values underestimate and mix across the heavy mid-spectrum; r3
    batches H2/L). Eigenvalues from the Rayleigh compression QᵀKQ, which
    cannot produce the junk estimates of the inverse-based Nyström lift
    (see _rayleigh_compress_precond). Construction: one (n, r) QR + one
    fused K·(n, r) sweep + one (r, r) eigh.

    `matmat` computes (K + σ²I)·V for (n, b) blocks (the lazy-path
    convention); σ² is subtracted internally."""
    return _rayleigh_compress_precond(
        jnp.asarray(C), _blocked_k_apply(matmat, noise, block), noise)


def randomized_eig_precond(matmat, n, rank, noise, key, *, block=128):
    """Two-pass randomized EVD preconditioner from a GAUSSIAN sketch:
    Y = K·Ω, then the Rayleigh compression (_rayleigh_compress_precond).

    Purely matrix-free — needs no landmark column evaluations, so it
    works when only a black-box matmat exists. CAVEAT (measured, r3
    batch L): on slow-decay kernel spectra the Gaussian range needs
    substantially more rank than landmark columns for the same CG
    coverage — at n=65k the rank-512 sketch left the sum-kernel PCG
    stalled where `rayleigh_nystrom_precond` converges, while rank 2048
    converged in 41 iters (beating the inverse-lift construction, which
    stalls there). Prefer `rayleigh_nystrom_precond` whenever kernel
    columns are available.

    `matmat` computes (K + σ²I)·V for (n, b) blocks; σ² is subtracted
    internally."""
    r = int(min(rank, n))
    from stpy_tpu.config import default_dtype

    k_apply = _blocked_k_apply(matmat, noise, block)
    Om = jax.random.normal(key, (n, r), default_dtype())
    return _rayleigh_compress_precond(k_apply(Om), k_apply, noise)


def nystrom_precond_from_cross(C, idx, noise, shift=1e-5):
    """Randomized-Nyström preconditioner (Frangella–Tropp–Udell style) from
    a landmark cross-Gram: given C = K[:, idx] (n, r) for r landmark rows
    `idx`, build the apply of (K_nys + σ²I)⁻¹ with
    K_nys = C K[idx, idx]⁺ Cᵀ.

    Fully batched — one (r, r) eigendecomposition for the pseudo-inverse
    (clamped at `shift`·λmax: smooth kernels make K[idx, idx] numerically
    singular, and a junk near-null eigenvector lifted by λ^{-1/2} would
    inject a large spurious B column; 1e-5·λmax sits ~100x above the f32
    eigh noise floor while staying below the useful part of the
    spectrum), one (n, r) GEMM, then the shared SPD eigenform apply
    (which carries its own validity guards, see lowrank_eigen_precond) — so
    unlike the greedy `pivoted_cholesky_kernel` there is NO sequential
    rank loop, which makes it the right construction INSIDE a jitted
    evidence step whose hyperparameters (and hence the preconditioner)
    change every call (parallel/bbmm.py). Apply cost: two (n, r) GEMMs."""
    Wm = C[idx]                                     # (r, r) = K[idx, idx]
    lw, Qw = jnp.linalg.eigh(Wm)
    lw = jnp.maximum(lw, shift * jnp.maximum(lw[-1], 1e-30))
    B = C @ (Qw * jax.lax.rsqrt(lw)[None, :])       # C W^{-1/2}
    return lowrank_eigen_precond(B, noise)


def _make_df_gemv_sharded(kernel_object, desc, mesh, axis, df_chunk):
    """Row-sharded EXACT df GEMV (hi+lo of K(a, b)·(vh+vl)) over a mesh:
    each device sweeps its (rows/p, n_b) strip of the (hi, lo) Gram in
    df_chunk tiles (df_gram_from_desc + gemv_df, the same arithmetic as
    the single-chip chunked tier) with b/vh/vl replicated — the sharding
    pattern of `make_chunked_matvec_sharded` applied to the double-float
    residual/mean GEMVs, which is what extends `precision="double"` beyond
    one chip (r5, VERDICT task 4; parity: gauss_procc.py:152 — the torch
    reference is f64 at any n it can hold)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    from stpy_tpu.kernels.df_plan import df_gram_from_desc
    from stpy_tpu.ops.compensated import gemv_df

    p = mesh.shape[axis]

    @_ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def local_rows(a_local, b, vh, vl):
        outs_h, outs_l = [], []
        c = min(df_chunk, a_local.shape[0])
        for r0 in range(0, a_local.shape[0], c):
            Kh, Kl = df_gram_from_desc(
                kernel_object, {}, a_local[r0:r0 + c], b, desc)
            Ph, Pl = gemv_df(Kh, Kl, vh, vl=vl)
            outs_h.append(Ph)
            outs_l.append(Pl)
        if len(outs_h) == 1:
            return outs_h[0], outs_l[0]
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)

    def df_gemv(a, b, vh, vl):
        n = a.shape[0]
        pad = (-n) % p
        ap = jnp.pad(a, ((0, pad), (0, 0))) if pad else a
        hh, ll = local_rows(ap, b, jnp.asarray(vh).reshape(-1),
                            jnp.asarray(vl).reshape(-1))
        return hh[:n], ll[:n]

    return df_gemv


class IterativeGP:
    """Large-n exact-GP inference by preconditioned CG over a mesh.

    API mirrors GaussianProcess (fit_gp / mean / mean_std /
    sample_pathwise / optimize_params); designed for n where a dense
    Cholesky no longer fits one chip."""

    def __init__(self, kernel_object, s=0.1, mesh=None, axis="tp",
                 tol=1e-6, maxiter=500, lazy=False,
                 chunk=2048, precond_rank="auto", precision="single",
                 df_refine_steps=2, df_chunk=4096, var_refine=1):
        self.kernel_object = kernel_object
        self.s = s
        self.mesh = mesh
        self.axis = axis
        self.tol = tol
        self.maxiter = maxiter
        self.lazy = lazy
        self.chunk = chunk  # row-chunk of the general (any-kernel) matvec
        # precond_rank: rank-r Rayleigh-Nyström preconditioner on the lazy
        # single-chip path (the mesh path uses block-Jacobi).
        # Ill-conditioned large-n systems (small noise, long lengthscales)
        # need it: at n=65k/s=0.2 the unpreconditioned CG stalls at 4.7e-2
        # residual in 400 iterations (exp_r3_batch_a a3). Default "auto"
        # resolves per fit size (resolve_precond_rank) so the constructor
        # defaults converge at 65k without the user knowing the machinery
        # (VERDICT r3 task 8); pass an int (0 disables) to override.
        self.precond_rank = precond_rank
        # precision="double": extend the dense tier's double-float story
        # beyond HBM — after the f32 PCG solve, run iterative refinement
        # with EXACT df residuals computed by a row-chunked (hi, lo)
        # Pallas Gram + exact df GEMV (no stored Gram, O(df_chunk·n)
        # transient), carry alpha as a df pair, and evaluate the posterior
        # MEAN with a chunked exact df cross-GEMV. Converges at rate =
        # the inner CG's relative error (`tol`), so 1-2 steps land on the
        # df floor. With a mesh (r5, VERDICT task 4) the df residual/mean
        # GEMVs shard over the same row axis as the f32 matvec
        # (_make_df_gemv_sharded): each device sweeps its (n/p, n) row
        # strip of the (hi, lo) Gram in df_chunk tiles, so f64-class
        # posteriors are no longer a single-chip-only capability.
        # Variance: `var_refine` steps of df-residual-refined block solves
        # + df quadratic forms (r5, VERDICT task 5) — see mean_std.
        # df kernel families only (kernels/df_plan.py).
        # Parity: gauss_procc.py:152 — f64 posterior for every kernel.
        if precision not in ("single", "double"):
            raise ValueError(
                f"precision must be single|double, got {precision}")
        self.precision = precision
        self.df_refine_steps = max(0, int(df_refine_steps))
        self.df_chunk = int(df_chunk)
        # var_refine (double mode, exact-variance path): number of
        # df-residual refinement steps applied to each 128-RHS block solve
        # before the row-chunked df quadratic form — the matrix-free
        # counterpart of the dense tier's var_refine (r5, VERDICT task 5;
        # parity: gauss_procc.py:391-399, f64 predictive variance).
        # 0 = f32/CG-grade variance (the r4 behavior). Mesh double runs
        # keep f32-grade variance for now (the df mean/residual GEMVs are
        # sharded; the strip qform is single-chip).
        self.var_refine = max(0, int(var_refine))
        self._A_df = None
        self.fitted = False

    def _lazy_matvec_or_none(self, x):
        """Matrix-free (K + σ²I)v — O(n·chunk) memory at most, n beyond HBM.

        Fast tier: sums of fused-Pallas atoms (SE/ARD/Matérn ν ∈
        {½,3/2,5/2}, optionally on coordinate groups) run as one fused
        Gram·v pass per atom. Any OTHER kernel (products, additive groups,
        laplace, …) falls back to the row-chunked general matvec —
        `lazy=True` now covers the full kernel algebra (parity:
        stpy/kernels.py:76-94,136-159 at matrix-free scale)."""
        from stpy_tpu.parallel.lazy_kernel import (
            atom_params, fast_atoms, make_chunked_matvec, make_sum_matvec,
        )

        ko = self.kernel_object
        atoms = fast_atoms(ko)
        if atoms is None:
            return make_chunked_matvec(ko, x, noise=self.s,
                                       chunk=self.chunk)
        gk = [atom_params(ko, a) for a in atoms]
        return make_sum_matvec(
            x, atoms, [g for g, _ in gk], [k for _, k in gk], noise=self.s
        )

    def _lazy_matmat(self, x):
        """Block-RHS companion of the lazy matvec (same kernel config)."""
        from stpy_tpu.parallel.lazy_kernel import (
            atom_params, fast_atoms, make_chunked_matmat, make_sum_matmat,
        )

        ko = self.kernel_object
        atoms = fast_atoms(ko)
        if atoms is None:
            return make_chunked_matmat(ko, x, noise=self.s,
                                       chunk=self.chunk)
        gk = [atom_params(ko, a) for a in atoms]
        return make_sum_matmat(
            x, atoms, [g for g, _ in gk], [k for _, k in gk], noise=self.s
        )

    # -- double-float tier helpers --------------------------------------

    def _df_desc(self):
        from stpy_tpu.kernels.df_plan import df_atom_desc

        if getattr(self, "_df_desc_cache", None) is None:
            self._df_desc_cache = df_atom_desc(self.kernel_object)
        return self._df_desc_cache

    def _df_cross_gemv(self, a, b, vh, vl, desc):
        """EXACT df K(a, b)·(vh + vl), row-chunked: per chunk one (hi, lo)
        Pallas Gram + one exact df GEMV — the (df_chunk, n) pair is a
        transient, never a stored Gram. Returns (hi, lo) of shape
        (len(a),). With a mesh the row sweep shards over the same axis as
        the f32 matvec (one strip per device — _make_df_gemv_sharded)."""
        from stpy_tpu.kernels.df_plan import df_gram_from_desc
        from stpy_tpu.ops.compensated import gemv_df

        ko = self.kernel_object
        if self.mesh is not None:
            if getattr(self, "_df_gemv_sharded", None) is None:
                self._df_gemv_sharded = _make_df_gemv_sharded(
                    ko, desc, self.mesh, self.axis, self.df_chunk)
            return self._df_gemv_sharded(
                a, b, vh, jnp.zeros_like(jnp.asarray(vh)) if vl is None
                else vl)
        outs_h, outs_l = [], []
        c = self.df_chunk
        for r0 in range(0, a.shape[0], c):
            Kh, Kl = df_gram_from_desc(ko, {}, a[r0:r0 + c], b, desc)
            Ph, Pl = gemv_df(Kh, Kl, vh, vl=vl)
            outs_h.append(Ph)
            outs_l.append(Pl)
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)

    def _matvec_factory(self, x):
        """Row-sharded (K + σ²I) v matvec. With a mesh: shard_map over row
        blocks; without: plain dense matvec. Also builds the block-RHS
        companion `self._matmat` for every tier, so `mean_std`'s exact
        variance runs one 128-column block CG per chunk instead of one CG
        per test point (VERDICT r3 task 8)."""
        ko = self.kernel_object
        n = x.shape[0]
        s2 = self.s**2
        rank = resolve_precond_rank(self.precond_rank, n)

        if self.lazy and self.mesh is None:
            self._matmat = self._lazy_matmat(x)
            M_inv = None
            if rank > 0:
                # landmark-sketch Rayleigh EVD: landmark Gram columns give
                # the coverage a Gaussian sketch of equal rank lacks on
                # slow-decay spectra, and the Rayleigh compression gives
                # eigenvalues the inverse-based Nyström lift cannot —
                # see rayleigh_nystrom_precond's docstring for the
                # measured failure ladder (r3 batches A/C4/H/H2/K/L).
                r = int(min(rank, x.shape[0]))
                idx = jax.random.choice(
                    jax.random.fold_in(jax.random.PRNGKey(0), 7),
                    x.shape[0], (r,), replace=False)
                C = ko.eval_params(ko.params_dict, x, x[idx])
                M_inv = rayleigh_nystrom_precond(
                    C, self._matmat, self.s)
            return self._lazy_matvec_or_none(x), M_inv

        if self.lazy and self.mesh is not None:
            # sharded matrix-free matvec: each device runs the fused Gram
            # kernel lazily on its (n/p, n) row tile — O(n/p + n) memory
            # per device (vs O(n²/p) for the dense mesh path below).
            # Fast tier: SUMS of fused atoms (SE/ARD/Matérn, optional
            # coordinate groups) — one fused pass per atom per device.
            # Anything else (products, additive groups, laplace, …) takes
            # the general row-chunked tier over the same mesh:
            # O(chunk·n)/device, never the dense n²/p tiles the user
            # chose lazy to avoid. Parity: stpy/kernels.py:76-94,136-159
            # at mesh scale (r3).
            from stpy_tpu.parallel.lazy_kernel import (
                atom_params, fast_atoms, make_chunked_matmat_sharded,
                make_chunked_matvec_sharded, make_sum_matmat_sharded,
                make_sum_matvec_sharded,
            )

            atoms = fast_atoms(ko)
            if atoms is not None:
                gk = [atom_params(ko, a) for a in atoms]
                gs, ks = [g for g, _ in gk], [k for _, k in gk]
                mv = make_sum_matvec_sharded(
                    x, self.mesh, self.axis, atoms, gs, ks, noise=self.s)
                self._matmat = make_sum_matmat_sharded(
                    x, self.mesh, self.axis, atoms, gs, ks, noise=self.s)
            else:
                mv = make_chunked_matvec_sharded(
                    ko, x, self.mesh, self.axis, noise=self.s,
                    chunk=self.chunk)
                self._matmat = make_chunked_matmat_sharded(
                    ko, x, self.mesh, self.axis, noise=self.s,
                    chunk=self.chunk)
            return mv, None

        if self.mesh is None:
            K = ko.gram(x) + s2 * jnp.eye(n, dtype=x.dtype)
            self._matmat = lambda V: K @ V
            return lambda v: K @ v, None

        mesh, axis = self.mesh, self.axis
        p = mesh.shape[axis]
        assert n % p == 0, "n must divide the mesh axis for row sharding"
        xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))

        # per-device row tile of the Gram, built once (O(n²/p) memory/device)
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None),), out_specs=P(axis, None),
            check_vma=False,
        )
        def build_rows(x_local):
            x_all = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            K_rows = ko.eval_params(ko.params_dict, x_local, x_all)
            # add σ² on this tile's diagonal offsets
            i = jax.lax.axis_index(axis)
            nb = x_local.shape[0]
            rows = jnp.arange(nb)
            cols = i * nb + rows
            return K_rows.at[rows, cols].add(s2)

        K_rows = build_rows(xs)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis),
            check_vma=False,
        )
        def matvec_sharded(K_local, v):
            return (K_local @ v).ravel()

        def matvec(v):
            return matvec_sharded(K_rows, v.reshape(-1, 1))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis, None),
            check_vma=False,
        )
        def matmat_sharded(K_local, V):
            return K_local @ V

        self._matmat = lambda V: matmat_sharded(K_rows, V)

        # block-Jacobi preconditioner: per-device diagonal block factor
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None),), out_specs=P(axis, None),
            check_vma=False,
        )
        def build_precond(K_local):
            i = jax.lax.axis_index(axis)
            nb = K_local.shape[0]
            block = jax.lax.dynamic_slice(
                K_local, (jnp.int32(0), i.astype(jnp.int32) * nb), (nb, nb)
            )
            return chol_jittered(block)

        L_blocks = build_precond(K_rows)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis),
            check_vma=False,
        )
        def precond_sharded(L_local, r):
            i = jax.lax.axis_index(axis)
            nb = L_local.shape[0]
            r_local = jax.lax.dynamic_slice(
                r.reshape(-1), (i.astype(jnp.int32) * nb,), (nb,)
            )
            return cho_solve(L_local, r_local.reshape(-1, 1)).ravel()

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(axis, None),
            check_vma=False,
        )
        def precond_sharded_block(L_local, R):
            i = jax.lax.axis_index(axis)
            nb = L_local.shape[0]
            R_local = jax.lax.dynamic_slice(
                R, (i.astype(jnp.int32) * nb, jnp.int32(0)),
                (nb, R.shape[1])
            )
            return cho_solve(L_local, R_local)

        def M_inv(r):
            return precond_sharded(L_blocks, r)

        self._M_inv_block = lambda R: precond_sharded_block(L_blocks, R)

        return matvec, M_inv


    def optimize_params(self, optimize=("gamma", "noise"), steps=30,
                        lr=0.1, probes=64, tol=1e-2, key=None,
                        verbose=False, refit=True, **kwargs):
        """Hyperparameter fit on the matrix-free evidence — the large-n
        counterpart of GaussianProcess.optimize_params. Writes the winners
        back into `kernel_object.params_dict` (and `self.s` if "noise" is
        optimized), and refits.

        Dispatch (parity: the reference's hyperopt works for any kernel,
        stpy/estimator.py:141-223):
          * sums of fused atoms (SE/ARD/Matérn, incl. `k1 + k2` algebra and
            coordinate groups) → `fit_evidence_sum` — per-atom (γ_a, κ_a)
            with ARD vectors optimized PER-DIM and written back as vectors;
          * anything else (products, additive groups, laplace, …) →
            `fit_evidence_general` — autodiff gradients through the
            row-chunked Gram over every gamma/kappa leaf.

        Requires fit_gp to have been called (uses the stored x, y).
        """
        import numpy as _np

        from stpy_tpu.parallel.bbmm import (
            fit_evidence_general, fit_evidence_sum,
        )
        from stpy_tpu.parallel.lazy_kernel import atom_params, fast_atoms

        if getattr(self, "x", None) is None:
            raise RuntimeError("call fit_gp before optimize_params")
        ko = self.kernel_object
        dt = jnp.asarray(self.y).dtype
        yv = jnp.asarray(self.y).reshape(-1)
        # the evidence fit inherits the estimator's auto-resolved
        # preconditioner rank (65k+ fits stall without one — RESULTS.md);
        # an explicit precond_rank kwarg still wins
        kwargs.setdefault("precond_rank", resolve_precond_rank(
            self.precond_rank, int(self.x.shape[0])))
        atoms = fast_atoms(ko)

        if atoms is not None:
            desc = tuple((a.family, a.nu, a.group) for a in atoms)
            gk = [atom_params(ko, a) for a in atoms]
            out = fit_evidence_sum(
                self.x, yv, desc,
                [g for g, _ in gk], [float(k) for _, k in gk],
                float(self.s), optimize=optimize, steps=steps, lr=lr,
                probes=probes, tol=tol, key=key, verbose=verbose, **kwargs,
            )
            for a, g_new, k_new in zip(atoms, out["gammas"], out["kappas"]):
                p = ko.params_dict[str(a.index)]
                if "gamma" in optimize:
                    g_arr = jnp.asarray(_np.asarray(g_new), dt)
                    if a.gamma_key == "ard_gamma":
                        stored = jnp.asarray(p[a.gamma_key]).reshape(-1)
                        if a.group is not None:
                            # scatter the fitted slice into the full-d vector
                            g_fit = jnp.broadcast_to(
                                g_arr.reshape(-1), (len(a.group),)
                            )
                            stored = stored.at[jnp.asarray(a.group)].set(
                                g_fit.astype(dt)
                            )
                        else:
                            stored = jnp.broadcast_to(
                                g_arr.reshape(-1), stored.shape
                            ).astype(dt)
                        p[a.gamma_key] = stored
                    else:
                        p[a.gamma_key] = g_arr.reshape(())
                if "kappa" in optimize:
                    p["kappa"] = jnp.asarray(k_new, dt)
            if "noise" in optimize:
                self.s = out["noise"]
            if len(atoms) == 1:  # single-atom compat aliases
                out = {**out, "gamma": out["gammas"][0],
                       "kappa": out["kappas"][0]}
        else:
            out = fit_evidence_general(
                ko, self.x, yv, noise0=float(self.s), optimize=optimize,
                steps=steps, lr=lr, probes=probes, tol=tol, key=key,
                verbose=verbose, chunk=self.chunk, **kwargs,
            )
            for ak, sub in out["params"].items():
                for pk, val in sub.items():
                    ko.params_dict[ak][pk] = jnp.asarray(val, dt)
            if "noise" in optimize:
                self.s = out["noise"]
        if refit:
            self.fit_gp(self.x, self.y)
        return out

    def fit_gp(self, x, y):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.x, self.y = x, y
        self.n = x.shape[0]
        matvec, M_inv = self._matvec_factory(x)
        self._matvec = matvec
        self._M_inv = M_inv

        # segmented above 32k: one monolithic multi-hundred-iteration
        # while_loop program at this scale runs long enough to kill the
        # TPU worker through the tunnel (cg_solve_block_segmented)
        if self.n > 32768:
            alpha, it, res = cg_solve_segmented(
                matvec, y.ravel(), M_inv=M_inv, tol=self.tol,
                maxiter=self.maxiter,
            )
        else:
            alpha, it, res = cg_solve(
                matvec, y.ravel(), M_inv=M_inv, tol=self.tol,
                maxiter=self.maxiter,
            )
        self.A = alpha.reshape(-1, 1)
        self.cg_iterations = int(it)
        self.cg_residual = float(res)
        converged = self.cg_residual <= self.tol
        stalled = (not converged) and self.cg_iterations < self.maxiter
        self.cg_stalled = stalled
        if not converged and self.precision != "double":
            # failure detection as returned flags (SURVEY §5) — the dense
            # tier reports cholesky_ok; here the analogue is the inner
            # solve stopping short of tol. In double mode the df
            # refinement absorbs a loose inner solve (rate = its relative
            # error; see df_residuals), so only the f32 tier warns.
            if stalled:
                warnings.warn(
                    f"IterativeGP CG stagnated at relative residual "
                    f"{self.cg_residual:.1e} after {self.cg_iterations} "
                    f"iterations (tol {self.tol:.1e} is below the f32 "
                    "matvec noise floor, ~sqrt(n)*eps relative); the "
                    "posterior is as accurate as one f32 pass allows — "
                    "use precision='double' for tighter solves",
                    stacklevel=2,
                )
            else:
                warnings.warn(
                    f"IterativeGP CG hit maxiter={self.maxiter} at "
                    f"relative residual {self.cg_residual:.1e} (tol "
                    f"{self.tol:.1e}); posterior accuracy is bounded by "
                    "this residual — raise maxiter/precond_rank or use "
                    "precision='double'",
                    stacklevel=2,
                )
        if self.precision == "double":
            # iterative refinement with EXACT df residuals: converges at
            # rate ~ the inner PCG's relative error, so `df_refine_steps`
            # steps push the alpha error to (cg tol)^(steps+1) toward the
            # df representation floor — the dense tier's ≤1e-7 posterior-
            # mean story (models/exact_gp.py) extended beyond HBM.
            from stpy_tpu.ops.pallas_gram_df import _two_prod, _two_sum

            desc = self._df_desc()
            s = jnp.asarray(self.s, x.dtype)
            a_h = self.A
            a_l = jnp.zeros_like(a_h)
            s2h, s2e = _two_prod(s, s)
            yn = float(jnp.linalg.norm(y))
            # exact relative residual ‖y − Aα‖/‖y‖ BEFORE each correction —
            # the accuracy evidence at scales where no f64 host reference
            # is computable: ‖α − α*‖ ≤ ‖r‖/σ², so the step-k entry bounds
            # the post-step-(k−1) alpha error
            self.df_residuals = []
            for _ in range(self.df_refine_steps):
                Ph, Pl = self._df_cross_gemv(x, x, a_h, a_l, desc)
                qh, qe = _two_prod(s2h, a_h)
                qe = qe + (s2e * a_h + s2h * a_l)
                rh, re = _two_sum(y, -Ph[:, None])
                rh, re2 = _two_sum(rh, -qh)
                r = rh + ((re + re2) - Pl[:, None] - qe)
                self.df_residuals.append(float(jnp.linalg.norm(r)) / yn)
                d, _, _ = cg_solve(matvec, r.ravel(), M_inv=M_inv,
                                   tol=self.tol, maxiter=self.maxiter)
                nh, e = _two_sum(a_h, d.reshape(-1, 1))
                a_h, a_l = nh, a_l + e
            self._A_df = jnp.concatenate([a_h, a_l], axis=1)
            self.A = a_h
            # double mode suppresses the generic maxiter warning above on
            # the premise that refinement absorbs a loose inner solve — but
            # refinement contracts at rate ≈ the inner solve's RELATIVE
            # error, so a genuinely stalled CG (residual ~1) refines
            # nowhere. Warn when the measured df residuals fail to
            # contract, or when there were no refinement steps to absorb a
            # non-converged inner solve at all.
            rs = self.df_residuals
            stalled = (
                len(rs) >= 2 and rs[0] > 0 and rs[-1] > 0.5 * rs[0]
            ) or (len(rs) >= 1 and rs[-1] > 1e-1)
            if stalled or (not converged and self.df_refine_steps == 0):
                warnings.warn(
                    "IterativeGP double-mode refinement is not contracting "
                    f"(df residuals {rs}, inner CG residual "
                    f"{self.cg_residual:.1e}); the posterior is bounded by "
                    "the LAST df residual, not the df floor — raise "
                    "maxiter/precond_rank so the inner solve makes progress",
                    stacklevel=2,
                )
        else:
            self._A_df = None
        self.fit_status = {
            "converged": bool(converged),
            "stalled_at_floor": bool(stalled),
            "cg_iterations": self.cg_iterations,
            "cg_residual": self.cg_residual,
            "n": int(self.n),
            "precision": self.precision,
            "df_residuals": list(getattr(self, "df_residuals", []) or [])
            if self.precision == "double" else None,
        }
        self.fitted = True
        return None

    def mean(self, xtest):
        xtest = as_array(xtest)
        if self._A_df is not None:
            # exact df cross-GEMV on the df alpha pair: a single-f32 mean
            # GEMV would cap the mean at eps·‖K*‖‖α‖/‖μ‖ regardless of the
            # refined alpha's accuracy (same reasoning as the dense tier)
            Mh, Ml = self._df_cross_gemv(
                xtest, self.x, self._A_df[:, :1], self._A_df[:, 1:],
                self._df_desc(),
            )
            return (Mh + Ml)[:, None]
        K_star = self.kernel_object.cross(xtest, self.x)
        return K_star @ self.A

    def mean_std(self, xtest, probes=16, key=None, method=None,
                 exact_threshold=1024):
        """Mean exactly; variance either exactly (one CG solve per test
        point, vmapped — default up to `exact_threshold` points) or by
        Hutchinson probes (unbiased but noisy; for very large test sets)."""
        xtest = as_array(xtest)
        mu = self.mean(xtest)
        t = xtest.shape[0]
        method = method or ("exact" if t <= exact_threshold else "hutchinson")

        M_inv = getattr(self, "_M_inv", None)
        if (method == "exact" and self.precision == "double"
                and self.var_refine > 0 and self.mesh is None):
            # df-refined matrix-free variance (r5, VERDICT task 5):
            # better-than-f32 predictive variance beyond dense HBM — the
            # df path builds its own df cross-Gram, so the f32 K_star
            # below is skipped entirely
            solver = (cg_solve_block_segmented if self.n > 32768
                      else cg_solve_block)
            M_blk = M_inv if (self.lazy and self.mesh is None) else \
                getattr(self, "_M_inv_block", None)
            return mu, self._std_exact_df(xtest, solver, self._matmat,
                                          M_blk)
        K_star = self.kernel_object.cross(xtest, self.x)
        kss = self.kernel_object.diag(xtest)
        if method == "exact":
            # block CG on EVERY tier: 128 columns per block product (one
            # fused multi-RHS Gram pass on the lazy tiers, one row-sharded
            # GEMM on the mesh tiers, one dense GEMM otherwise) — never a
            # per-test-point vmapped CG (VERDICT r3 task 8). The block
            # preconditioner is the Rayleigh M_inv (block-capable) on the
            # lazy path and the block-Jacobi block apply on the dense mesh.
            mm = self._matmat
            M_blk = M_inv if (self.lazy and self.mesh is None) else \
                getattr(self, "_M_inv_block", None)
            # above 32k: bounded-length device programs (a monolithic
            # 500-iteration 65k block-CG program kills the TPU worker —
            # see cg_solve_block_segmented); smaller systems keep the
            # single-dispatch while_loop
            solver = (cg_solve_block_segmented if self.n > 32768
                      else cg_solve_block)
            quads = []
            B = K_star.T  # (n, t)
            for c0 in range(0, t, 128):
                blk = B[:, c0:c0 + 128]
                sol, _ = solver(
                    mm, blk, M_inv=M_blk,
                    tol=self.tol, maxiter=self.maxiter,
                )
                quads.append(jnp.sum(blk * sol, axis=0))
            quad = jnp.concatenate(quads)
            var = jnp.clip(kss - quad, 1e-12)
            return mu, jnp.sqrt(var)[:, None]

        key = key if key is not None else jax.random.PRNGKey(0)

        def probe(k):
            z = jax.random.rademacher(k, (t,)).astype(xtest.dtype)
            v = K_star.T @ z
            sol, _, _ = cg_solve(
                self._matvec, v, M_inv=M_inv, tol=self.tol,
                maxiter=self.maxiter
            )
            return z * (K_star @ sol)

        keys = jax.random.split(key, probes)
        est = jnp.mean(jax.vmap(probe)(keys), axis=0)
        var = jnp.clip(kss - est, 1e-12)
        return mu, jnp.sqrt(var)[:, None]

    def _std_exact_df(self, xtest, solver, mm, M_blk):
        """Matrix-free DOUBLE-FLOAT predictive std (r5, VERDICT task 5 —
        parity: gauss_procc.py:391-399, the reference's f64 variance at
        any n it can hold).

        Per 128-column block of B = K(x, xtest):
          1. f32 block (P)CG solve W ≈ (K + σ²I)⁻¹ Bh — accuracy capped at
             the f32 matvec noise floor (~√n·eps relative);
          2. `var_refine` df-residual refinement steps: R = B − K·W − σ²W
             with the (hi, lo) row-chunked Gram and compensated products
             (ops/compensated.df_gemm — error ~√chunk·eps of gross, 1-2
             orders under the f32 CG floor), then one more block solve on
             R — the residual after the step is bounded by the df product
             error, not the CG floor;
          3. the row-strip df quadratic form (ops/pallas_qform_df.
             qform_refined_strip — the dense tier's ozaki kernel over
             (df_chunk, n) Gram strips, df-folded across strips):
             q = Σ W ⊙ (2B − K·W − σ²W) is second-order in W's remaining
             residual and its arithmetic is exact;
          4. var = (k** − q) evaluated in df — k** from the df Gram diag,
             so the catastrophic cancellation k** − q happens between two
             double-float quantities.

        Never materializes a dense Gram: every step sweeps (df_chunk, n)
        strips. Cost ≈ (1 + 2·var_refine) df Gram sweeps + (1 + var_refine)
        block CG solves per 128 columns."""
        from stpy_tpu.kernels.df_plan import df_gram_from_desc
        from stpy_tpu.ops.compensated import df_gemm
        from stpy_tpu.ops.pallas_gram_df import _two_prod, _two_sum
        from stpy_tpu.ops.pallas_qform_df import qform_refined_strip

        desc = self._df_desc()
        ko = self.kernel_object
        x = self.x
        n, t = x.shape[0], xtest.shape[0]
        c = self.df_chunk
        s = jnp.asarray(self.s, x.dtype)
        s2h, s2e = _two_prod(s, s)

        # df cross-Gram B = K(x, xtest): (n, t) pair, built in row strips
        Bh_p, Bl_p = [], []
        for r0 in range(0, n, c):
            Kh, Kl = df_gram_from_desc(ko, {}, x[r0:r0 + c], xtest, desc)
            Bh_p.append(Kh)
            Bl_p.append(Kl)
        Bh, Bl = jnp.concatenate(Bh_p), jnp.concatenate(Bl_p)

        # df prior diag k**(xtest)
        kh_p, kl_p = [], []
        for r0 in range(0, t, 512):
            xt = xtest[r0:r0 + 512]
            Dh, Dl = df_gram_from_desc(ko, {}, xt, xt, desc)
            kh_p.append(jnp.diagonal(Dh))
            kl_p.append(jnp.diagonal(Dl))
        kss_h, kss_l = jnp.concatenate(kh_p), jnp.concatenate(kl_p)

        stds = []
        for c0 in range(0, t, 128):
            bh, bl = Bh[:, c0:c0 + 128], Bl[:, c0:c0 + 128]
            W, _ = solver(mm, bh, M_inv=M_blk, tol=self.tol,
                          maxiter=self.maxiter)
            for _ in range(self.var_refine):
                Rp = []
                for r0 in range(0, n, c):
                    Kh, Kl = df_gram_from_desc(ko, {}, x[r0:r0 + c], x,
                                               desc)
                    Ph, Pl = df_gemm(Kh, Kl, W)
                    Wl = W[r0:r0 + c]
                    rh, re = _two_sum(bh[r0:r0 + c], -Ph)
                    Rp.append(rh + (re + bl[r0:r0 + c] - Pl
                                    - (s2h * Wl + s2e * Wl)))
                R = jnp.concatenate(Rp)
                dW, _ = solver(mm, R, M_inv=M_blk, tol=self.tol,
                               maxiter=self.maxiter)
                W = W + dW
            qh = ql = None
            for r0 in range(0, n, c):
                Kh, Kl = df_gram_from_desc(ko, {}, x[r0:r0 + c], x, desc)
                ph, pl = qform_refined_strip(
                    Kh, Kl, W, W[r0:r0 + c], bh[r0:r0 + c], bl[r0:r0 + c],
                    s)
                if qh is None:
                    qh, ql = ph, pl
                else:
                    nh, e = _two_sum(qh, ph)
                    qh, ql = nh, ql + (e + pl)
            vh, ve = _two_sum(kss_h[c0:c0 + 128], -qh)
            var = jnp.clip(vh + ((ve + kss_l[c0:c0 + 128]) - ql), 1e-12)
            stds.append(jnp.sqrt(var))
        return jnp.concatenate(stds)[:, None]

    def sample_pathwise(self, xtest, embedding, size=1, key=None):
        """Matheron pathwise sampling with CG data correction — prior from
        a feature embedding, correction solve by CG (no Cholesky)."""
        key = key if key is not None else jax.random.PRNGKey(1)
        xtest = as_array(xtest)
        m = embedding.get_m()
        theta = jax.random.normal(key, (m, size), xtest.dtype)
        f_prior_t = embedding.embed(xtest) @ theta
        f_prior_x = embedding.embed(self.x) @ theta
        K_star = self.kernel_object.cross(xtest, self.x)
        resid = self.y - f_prior_x

        def solve_col(b):
            sol, _, _ = cg_solve(
                self._matvec, b, tol=self.tol, maxiter=self.maxiter
            )
            return sol

        corr = jax.vmap(solve_col, in_axes=1, out_axes=1)(resid)
        return f_prior_t + K_star @ corr
