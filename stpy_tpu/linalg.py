"""Dense linear algebra for GP fits: Cholesky with jitter policy, triangular
solves, rank-1 (Woodbury/Schur) updates, and iterative helpers.

Replaces the reference's torch lstsq/LU path (stpy/continuous_processes/
gauss_procc.py:367-378) and pinverse precompute (kernelized_features.py:
237-240) with Cholesky factorizations — O(n³/3), MXU-friendly, reused across
mean/variance/sampling. The jitter ladder makes f32 factorizations of nearly
singular Grams robust (the reference runs f64 and never needs this).
Everything is jit-safe: the retry loop is a `lax.while_loop` with a bounded
ladder, and failure is reported as a returned flag, not an exception
(SURVEY.md §5: solver status surfaced as flags under jit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stpy_tpu.config import default_jitter


def chol_jittered(K: jnp.ndarray, jitter: float | None = None) -> jnp.ndarray:
    """Single fixed-jitter Cholesky — fully differentiable (no while_loop).
    Use on gradient paths (evidence maximization); `safe_cholesky` with its
    escalating ladder is for inference-time factorizations."""
    n = K.shape[0]
    base = default_jitter(K.dtype) if jitter is None else jitter
    scale = jnp.mean(jnp.diagonal(K))
    scale = jnp.where(scale <= 0, 1.0, scale)
    return jnp.linalg.cholesky(K + base * scale * jnp.eye(n, dtype=K.dtype))


class CholResult(NamedTuple):
    L: jnp.ndarray          # lower-triangular factor of K + jitter*I
    jitter: jnp.ndarray     # jitter actually used (scalar)
    ok: jnp.ndarray         # bool: factorization succeeded


def chol_dense(K: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """Single-chip dense lower-Cholesky.

    Default is XLA's factorization: its internal updates carry full-f32
    quality, which the 1e-6 posterior target needs — an SE Gram's Schur
    complement collapses to the s² noise floor after the first block
    elimination, so trailing products need ~1e-7 ABSOLUTE accuracy and
    bf16x3 (HIGH) trailing loses ~3 digits end to end (measured:
    posterior mean 5.1e-6 → 2.6e-3 at n=16k).

    `fast=True` opts into the Pallas lower-syrk blocked factorization
    (ops/pallas_syrk.py): 55 ms net at n=16k vs XLA's 73 ms, backward error
    ~4e-6 — fine for MAP-style fits and preconditioners, not for the
    accuracy-gated posterior pipeline: through the predictive pipeline that
    backward error amplifies to 2.6e-3 posterior-mean / 4.2e-2 max-variance
    relative error at n=16k, and inside the full fit+predict program the
    wall time is a wash (206 vs 206 ms — benchmarks/exp_fastchol.py), so
    the XLA factorization stays the posterior default unconditionally.
    NaNs propagate on indefinite input exactly like jnp.linalg.cholesky,
    so the jitter ladder composes."""
    if fast and K.shape[0] >= 4096 and jax.default_backend() == "tpu":
        from stpy_tpu.ops.pallas_syrk import chol_blocked_syrk

        return chol_blocked_syrk(K)
    return jnp.linalg.cholesky(K)


def safe_cholesky(K: jnp.ndarray, jitter: float | None = None,
                  max_tries: int = 6, fast: bool = False) -> CholResult:
    """Cholesky of a PSD matrix with an escalating (10x) jitter ladder."""
    n = K.shape[0]
    base = default_jitter(K.dtype) if jitter is None else jitter
    scale = jnp.mean(jnp.diagonal(K))
    scale = jnp.where(scale <= 0, 1.0, scale)
    eye = jnp.eye(n, dtype=K.dtype)

    def attempt(j):
        L = chol_dense(K + j * scale * eye, fast=fast)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(state):
        _, ok, j, t = state
        return jnp.logical_and(~ok, t < max_tries)

    def body(state):
        _, _, j, t = state
        j = j * 10.0
        L, ok = attempt(j)
        return L, ok, j, t + 1

    L0, ok0 = attempt(jnp.asarray(base, K.dtype))
    L, ok, j, _ = jax.lax.while_loop(
        cond, body, (L0, ok0, jnp.asarray(base, K.dtype), jnp.asarray(0))
    )
    return CholResult(L=L, jitter=j * scale, ok=ok)


def safe_cholesky_rebuild(build_k, scale, jitter: float | None = None,
                          max_tries: int = 6, fast: bool = False,
                          dtype=None) -> CholResult:
    """Jitter-ladder Cholesky that REBUILDS the jittered matrix inside each
    retry instead of carrying the pre-jitter Gram across the while_loop
    (recompute-over-residency).

    `safe_cholesky(K)` closes its retry body over K, so XLA must keep the
    (n, n) Gram live for the whole ladder alongside the factor and the
    attempt workspace — ~3n² peak, which is what pushes a robust n=32k f32
    fit past one 16 GB v5e (benchmarks/exp_32k.py). Here the body closes
    over the (n, d) inputs via `build_k` and re-materializes K + jI per
    attempt, so peak residency is the single attempt's ~2n² — same as the
    fixed-jitter path — at the price of one extra Gram build per RETRY
    (retries are the rare case; the no-retry fast path costs exactly one
    build, like safe_cholesky).

    Args:
      build_k: `build_k(j) -> K + j*I` for an ABSOLUTE jitter scalar j —
        must construct the full jittered matrix from raw inputs (kernel
        Gram + noise + j on the diagonal), not index a captured K.
      scale: mean diagonal of K (computable in O(n) via `kernel.diag`,
        no Gram needed) — the ladder escalates j = base·scale·10^t like
        `safe_cholesky`.
      jitter: base relative jitter (default `default_jitter(dtype)`).
      dtype: dtype for the jitter scalar (default: infer from a zero-cost
        probe of `scale`).
    """
    scale = jnp.asarray(scale)
    dt = dtype if dtype is not None else scale.dtype
    base = default_jitter(jnp.zeros((), dt).dtype) if jitter is None else jitter
    scale = jnp.where(scale <= 0, 1.0, scale).astype(dt)

    def attempt(j):
        L = chol_dense(build_k(j * scale), fast=fast)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(state):
        _, ok, j, t = state
        return jnp.logical_and(~ok, t < max_tries)

    def body(state):
        _, _, j, t = state
        j = j * 10.0
        L, ok = attempt(j)
        return L, ok, j, t + 1

    L0, ok0 = attempt(jnp.asarray(base, dt))
    L, ok, j, _ = jax.lax.while_loop(
        cond, body, (L0, ok0, jnp.asarray(base, dt), jnp.asarray(0))
    )
    return CholResult(L=L, jitter=j * scale, ok=ok)


def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b given lower Cholesky factor L."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def tri_solve(L: jnp.ndarray, b: jnp.ndarray, lower: bool = True) -> jnp.ndarray:
    return jax.scipy.linalg.solve_triangular(L, b, lower=lower)


def tri_solve_blocked(L: jnp.ndarray, B: jnp.ndarray, nb: int = 512,
                      precision=None, leaf_inv=None) -> jnp.ndarray:
    """Lower-triangular solve L X = B with a WIDE RHS, reformulated so the
    work is almost entirely dense GEMMs (XLA's native TPU triangular solve
    runs ~5x below the matmul roofline at large RHS and OOMs at compile
    time for a 16k x 16k RHS).

    Schedule: DIVIDE-AND-CONQUER rather than a block loop. With static-shape
    halving  X_top = L11⁻¹ B_top;  B_bot −= L21 X_top;  X_bot = L22⁻¹ B_bot,
    the off-diagonal GEMMs sum to exactly n²·t FLOPs (the loop formulation
    multiplies the full X buffer every step and does 2·n²·t — measured 1.9x
    slower at n = t = 16k). Leaves (nb, nb) invert the diagonal block once
    and GEMM it into the RHS. Recursion happens at trace time (depth
    log₂(n/nb)), so the compiled program is a static DAG of GEMMs.

    nb=512 measured fastest for the n=16k fit+predict pipeline on v5e
    (207.7 ms vs 211.9 at nb=1024, 218.2 at nb=2048, 255.8 at nb=4096 —
    benchmarks/exp_bench_opt2.py): smaller leaves cut the latency-bound
    XLA leaf-inverse trisolves faster than the extra recursion levels cost.

    `precision` defaults to HIGH (bf16x3): the substitution GEMMs feed
    predictive-variance sums where this costs ≤0.8%% max relative variance
    error at n=16k (median 0.1%%; HIGHEST: max 0.05%%) while saving ~35%%
    wall time — measured vs a float64 host reference, docs/DESIGN.md §5.
    Pass jax.lax.Precision.HIGHEST for bit-critical uses.

    `leaf_inv`: precomputed batched diagonal-block inverses from
    `diag_block_invs(L, nb)` — pass the same array to several solves
    against one factor (e.g. the alpha solve and the variance solve of a
    GP fit+predict) to share the leaf work explicitly instead of hoping
    XLA CSEs it across call sites.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGH
    n = B.shape[0]
    pad = (-n) % nb
    if pad:
        Lp = jnp.zeros((n + pad, n + pad), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        Bp = jnp.pad(B, ((0, pad), (0, 0)))
        Dinv = diag_block_invs(Lp, nb) if leaf_inv is None else leaf_inv
        return _tri_rec(Lp, Bp, nb, precision, Dinv, 0)[:n]
    Dinv = diag_block_invs(L, nb) if leaf_inv is None else leaf_inv
    return _tri_rec(L, B, nb, precision, Dinv, 0)


def diag_block_invs(L: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Inverses of the (nb, nb) diagonal blocks of lower-triangular L as
    one (n/nb, nb, nb) array — a SINGLE batched XLA triangular solve.

    The blocked solves' leaves were the latency-bound part of the n=16k
    variance trisolve (32 sequential 512² XLA trisolves inside the DAG);
    batching them collapses that to one kernel launch, and passing the
    result to `tri_solve_blocked`/`cho_solve_blocked` via `leaf_inv`
    shares it across every solve against the same factor."""
    n = L.shape[0]
    k = n // nb
    blocks = jnp.moveaxis(
        jnp.diagonal(L.reshape(k, nb, k, nb), axis1=0, axis2=2), -1, 0
    )
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=L.dtype), (k, nb, nb))
    return jax.scipy.linalg.solve_triangular(blocks, eye, lower=True)


def _tri_rec(L, B, nb, precision, Dinv=None, off=0):
    n = L.shape[0]
    k = n // nb
    if k == 1:
        if Dinv is None:
            eye = jnp.eye(n, dtype=L.dtype)
            Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        else:
            Linv = Dinv[off // nb]
        return jax.lax.dot(Linv, B, precision=precision)
    h = (k // 2) * nb
    X1 = _tri_rec(L[:h, :h], B[:h], nb, precision, Dinv, off)
    B2 = B[h:] - jax.lax.dot(L[h:, :h], X1, precision=precision)
    X2 = _tri_rec(L[h:, h:], B2, nb, precision, Dinv, off + h)
    return jnp.concatenate([X1, X2], axis=0)


def cho_solve_blocked(L: jnp.ndarray, b: jnp.ndarray, nb: int = 512,
                      precision=jax.lax.Precision.HIGHEST,
                      leaf_inv=None, precision_bwd=None) -> jnp.ndarray:
    """(L Lᵀ)⁻¹ b via two recursive blocked triangular solves.

    Both passes draw their (nb, nb) diagonal-block inverses from ONE
    batched `diag_block_invs` call (the upper leaves are transposes of the
    lower ones), shared further with any `tri_solve_blocked` on the same
    factor via `leaf_inv` — making the alpha-solve nearly free next to the
    wide variance solve of a GP predict. Defaults to HIGHEST — the solves
    are GEMV/bandwidth-bound, so the extra precision costs nothing.

    precision_bwd optionally sets a DIFFERENT precision for the backward
    (Lᵀ) pass: for the GP variance W0 solve the forward pass's error is
    amplified through the whole backward recursion while backward-pass
    rounding stays local, so HIGHEST-forward/HIGH-backward gets
    HIGHEST-class accuracy at ~the mean of the two costs (measured
    benchmarks/exp_r5_serving2.py: var identity bias 3.8e-7 vs 3.7e-7
    full-HIGHEST, wall 1.069 s vs 1.140 s composite n=16k).
    """
    if precision_bwd is None:
        precision_bwd = precision
    n = b.shape[0]
    pad = (-n) % nb
    if pad:
        Lp = jnp.zeros((n + pad, n + pad), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        bp = jnp.pad(b, ((0, pad), (0, 0)))
        return cho_solve_blocked(Lp, bp, nb, precision, leaf_inv,
                                 precision_bwd)[:n]
    Dinv = diag_block_invs(L, nb) if leaf_inv is None else leaf_inv
    z = _tri_rec(L, b, nb, precision, Dinv, 0)
    return _tri_rec_upper(L.T, z, nb, precision_bwd, Dinv, 0)


def tri_solve_blocked_t(L: jnp.ndarray, B: jnp.ndarray, nb: int = 512,
                        precision=jax.lax.Precision.HIGHEST,
                        leaf_inv=None) -> jnp.ndarray:
    """Solve Lᵀ X = B (backward substitution) with the blocked recursion —
    the second half of `cho_solve_blocked`, exposed so a pipeline can fold
    the forward solve of several right-hand sides into ONE wide
    `tri_solve_blocked` and finish only the columns that need Lᵀ (e.g. the
    GP alpha) here. Accepts the same shared `leaf_inv`."""
    n = B.shape[0]
    pad = (-n) % nb
    if pad:
        Lp = jnp.zeros((n + pad, n + pad), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        Bp = jnp.pad(B, ((0, pad), (0, 0)))
        return tri_solve_blocked_t(Lp, Bp, nb, precision, leaf_inv)[:n]
    Dinv = diag_block_invs(L, nb) if leaf_inv is None else leaf_inv
    return _tri_rec_upper(L.T, B, nb, precision, Dinv, 0)


def _tri_rec_upper(U, B, nb, precision, Dinv=None, off=0):
    """Upper-triangular mirror of `_tri_rec` (backward substitution). The
    leaf inverse is the transpose of the lower-leaf inverse, so the batched
    `Dinv` (computed from L) serves both passes."""
    n = U.shape[0]
    k = n // nb
    if k == 1:
        if Dinv is None:
            eye = jnp.eye(n, dtype=U.dtype)
            Uinv = jax.scipy.linalg.solve_triangular(U.T, eye, lower=True).T
        else:
            Uinv = Dinv[off // nb].T
        return jax.lax.dot(Uinv, B, precision=precision)
    h = (k // 2) * nb
    X2 = _tri_rec_upper(U[h:, h:], B[h:], nb, precision, Dinv, off + h)
    B1 = B[:h] - jax.lax.dot(U[:h, h:], X2, precision=precision)
    X1 = _tri_rec_upper(U[:h, :h], B1, nb, precision, Dinv, off)
    return jnp.concatenate([X1, X2], axis=0)


def chol_recursive(K: jnp.ndarray, nb: int = 2048,
                   precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Lower Cholesky factor via trace-time divide-and-conquer:

        L11 = chol(A11);  L21ᵀ = L11⁻¹ A12;  L22 = chol(A22 − L21 L21ᵀ)

    so ~all of the n³/3 FLOPs are dense GEMMs on the MXU (the panel solve
    reuses `_tri_rec`, the Schur update is one symmetric GEMM, leaves are
    (nb, nb) XLA Choleskys). Defaults to HIGHEST precision — this factor
    feeds every downstream solve. Same result as jnp.linalg.cholesky up to
    roundoff; exists because XLA's TPU Cholesky runs ~3x below the GEMM
    roofline at n = 16k.
    """
    n = K.shape[0]
    pad = (-n) % nb
    if pad:
        Kp = jnp.zeros((n + pad, n + pad), K.dtype)
        Kp = Kp.at[:n, :n].set(K)
        Kp = Kp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        return _chol_rec(Kp, nb, precision)[:n, :n]
    return _chol_rec(K, nb, precision)


def _chol_rec(A, nb, precision, schur_precision=None):
    sp = precision if schur_precision is None else schur_precision
    n = A.shape[0]
    k = n // nb
    if k <= 1:
        return jnp.linalg.cholesky(A)
    h = (k // 2) * nb
    L11 = _chol_rec(A[:h, :h], nb, precision, sp)
    L21T = _tri_rec(L11, A[:h, h:], nb, precision)        # (h, n-h)
    S = A[h:, h:] - jax.lax.dot(L21T.T, L21T, precision=sp)
    L22 = _chol_rec(S, nb, precision, sp)
    top = jnp.concatenate(
        [L11, jnp.zeros((h, n - h), A.dtype)], axis=1
    )
    bot = jnp.concatenate([L21T.T, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def tri_solve_chunked(L: jnp.ndarray, B: jnp.ndarray, chunk: int = 1024,
                      lower: bool = True) -> jnp.ndarray:
    """Triangular solve with a wide RHS, chunked over columns via lax.map.

    XLA's TPU triangular-solve lowering allocates temporaries proportional to
    the full RHS width — a (16k, 16k) RHS OOMs HBM at compile (observed:
    66 GB requested for n=16384). Chunking the RHS into `chunk`-column
    blocks bounds peak memory while keeping each block solve MXU-efficient.
    """
    n, k = B.shape
    if k <= chunk:
        return jax.scipy.linalg.solve_triangular(L, B, lower=lower)
    pad = (-k) % chunk
    Bp = jnp.pad(B, ((0, 0), (0, pad)))
    blocks = jnp.moveaxis(Bp.reshape(n, -1, chunk), 1, 0)  # (nb, n, chunk)
    out = jax.lax.map(
        lambda blk: jax.scipy.linalg.solve_triangular(L, blk, lower=lower),
        blocks,
    )
    return jnp.moveaxis(out, 0, 1).reshape(n, -1)[:, :k]


def solve_psd(K: jnp.ndarray, b: jnp.ndarray, jitter: float | None = None):
    """One-shot PSD solve; returns (x, CholResult)."""
    res = safe_cholesky(K, jitter)
    return cho_solve(res.L, b), res


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def chol_rank1_update(L: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor of (L L^T + v v^T) in O(n²) (scan over rows).

    Used for `add_data_point` incremental refits (parity:
    stpy/continuous_processes/kernelized_features.py:186-222 does the
    analogous Woodbury/Schur bookkeeping)."""
    n = L.shape[0]
    idx = jnp.arange(n)

    def body(carry, k):
        L, v = carry
        Lkk = L[k, k]
        vk = v[k]
        r = jnp.sqrt(Lkk**2 + vk**2)
        c = r / Lkk
        s = vk / Lkk
        col = L[:, k]
        below = idx > k
        newcol = jnp.where(idx == k, r, jnp.where(below, (col + s * v) / c, col))
        v = jnp.where(below, c * v - s * newcol, v)
        L = L.at[:, k].set(newcol)
        return (L, v), None

    (L, _), _ = jax.lax.scan(body, (L, v), jnp.arange(n))
    return L


def woodbury_inv_update(Vinv: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """(V + u u^T)^{-1} from V^{-1} via Sherman–Morrison (primal rank-1
    update, parity: kernelized_features.py:199-206)."""
    Vu = Vinv @ u
    denom = 1.0 + u @ Vu
    return Vinv - jnp.outer(Vu, Vu) / denom


def schur_complement_extend(Kinv: jnp.ndarray, k_new: jnp.ndarray,
                            k_nn: jnp.ndarray):
    """Inverse of the (n+1)x(n+1) Gram given the n x n inverse (dual rank-1
    growth; parity: kernelized_features.py:186-198). Returns the extended
    inverse (capacity handling is the caller's job under jit)."""
    a = Kinv @ k_new
    s = k_nn - k_new @ a
    s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    top = Kinv + jnp.outer(a, a) / s
    n = Kinv.shape[0]
    out = jnp.zeros((n + 1, n + 1), Kinv.dtype)
    out = out.at[:n, :n].set(top)
    out = out.at[:n, n].set(-a / s)
    out = out.at[n, :n].set(-a / s)
    out = out.at[n, n].set(1.0 / s)
    return out


def power_iteration(A: jnp.ndarray, iters: int = 50, key=None) -> jnp.ndarray:
    """Top eigenvalue of a symmetric PSD matrix (replaces scipy eigsh at
    stpy/sampling/langevin.py:14 and poisson_rate_estimator.py:373)."""
    n = A.shape[0]
    v0 = jnp.ones((n,), A.dtype) / jnp.sqrt(n)
    if key is not None:
        v0 = jax.random.normal(key, (n,), A.dtype)
        v0 = v0 / jnp.linalg.norm(v0)

    def body(v, _):
        w = A @ v
        v = w / (jnp.linalg.norm(w) + 1e-30)
        return v, None

    v, _ = jax.lax.scan(body, v0, None, length=iters)
    return v @ (A @ v)


def symsqrt(A: jnp.ndarray, inv: bool = False, eps: float = 1e-12):
    """Symmetric (inverse) square root via eigh (replaces scipy sqrtm,
    stpy/embeddings/positive_embedding.py:69-71)."""
    w, V = jnp.linalg.eigh(A)
    w = jnp.clip(w, eps, None)
    s = jnp.where(inv, 1.0 / jnp.sqrt(w), jnp.sqrt(w))
    return (V * s) @ V.T
