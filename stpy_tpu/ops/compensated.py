"""Chunked-compensated GEMM: double-float-accurate matrix products on an
f32 MXU.

Why: an f32 GEMM's accuracy at large contraction depth is limited by its
f32 ACCUMULATOR, not by the products — at k=16k the reduction error is
~sqrt(k)*eps_f32 ~ 1e-5 relative, which is exactly the floor measured on
the predictive-variance refinement paths (benchmarks/exp_var.py: refined
z-form stalls at 1.7e-4 max var err). HIGHEST-precision products are
f32-faithful, so splitting the contraction dimension into chunks and
combining the per-chunk partial products with TwoSum compensation (an
(hi, lo) running sum) drops the reduction error to
~sqrt(chunk)*eps_f32 / n_chunks of the full sum — 1-2 orders below the
plain GEMM at ~15-50%% extra wall time (the products still run on the MXU;
the compensation is c extra VPU passes over the (m, n) output).

This is the standard "blocked compensated summation" construction applied
at the GEMM-schedule level instead of inside a kernel, so XLA keeps every
FLOP-heavy piece on the MXU. The TwoSum intermediates are wrapped in
optimization barriers (ops/pallas_gram_df.py:50 — the HLO algebraic
simplifier otherwise cancels the error terms).

No reference counterpart: the reference runs torch float64 end to end
(e.g. stpy/continuous_processes/gauss_procc.py:152) and never needs
compensated arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.ops.pallas_gram_df import _make_eft

_two_sum, _fast_two_sum, _two_prod, _df_add = _make_eft(True)


def gemm_compensated(A: jnp.ndarray, B: jnp.ndarray, chunk: int = 512,
                     precision=jax.lax.Precision.HIGHEST):
    """(Ch, Cl) with Ch + Cl ≈ A @ B summed in double-float across
    contraction chunks.

    A: (m, k), B: (k, n), f32. The contraction dim is split into
    ceil(k/chunk) chunks; each chunk's (m, n) partial product is a plain
    XLA GEMM at `precision` (HIGHEST = f32-faithful products), and the
    partials are folded into an (hi, lo) running sum with TwoSum. Returns
    the unevaluated pair — callers that want a plain f32 result should use
    Ch + Cl only at the final consumption point.
    """
    m, k = A.shape
    k2, n = B.shape
    assert k == k2, (A.shape, B.shape)
    if k <= chunk:
        return jax.lax.dot(A, B, precision=precision), jnp.zeros(
            (m, n), A.dtype
        )
    pad = (-k) % chunk
    if pad:
        A = jnp.pad(A, ((0, 0), (0, pad)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
    c = (k + pad) // chunk
    Ac = jnp.moveaxis(A.reshape(m, c, chunk), 1, 0)      # (c, m, chunk)
    Bc = B.reshape(c, chunk, n)                          # (c, chunk, n)

    def body(carry, ab):
        sh, sl = carry
        a, b = ab
        p = jax.lax.dot(a, b, precision=precision)
        nh, e = _two_sum(sh, p)
        return (nh, sl + e), None

    (sh, sl), _ = jax.lax.scan(
        body,
        (jnp.zeros((m, n), A.dtype), jnp.zeros((m, n), A.dtype)),
        (Ac, Bc),
    )
    return sh, sl


def df_gemm(Ah: jnp.ndarray, Al: jnp.ndarray, B: jnp.ndarray,
            chunk: int = 512, precision=jax.lax.Precision.HIGHEST):
    """(Ch, Cl) ≈ (Ah + Al) @ B for a double-float A against an f32 B.

    The hi part goes through the compensated chunked GEMM; the lo part is
    ~1e-8 of the hi scale, so a single plain f32 GEMM of Al @ B (error
    ~1e-13 of the total) is folded into the lo accumulator.
    """
    sh, sl = gemm_compensated(Ah, B, chunk=chunk, precision=precision)
    lo = jax.lax.dot(Al, B, precision=precision)
    return _fast_two_sum(sh, sl + lo)


def _df_sum_tree(h: jnp.ndarray, l: jnp.ndarray):
    """Reduce axis 0 of an (hi, lo) pair with a PAIRWISE TwoSum tree —
    log₂(k) vectorized VPU passes instead of a k-step sequential scan.

    The r2 version scanned one row at a time: at k = 16,384 that is 16k
    dependent micro-steps, which dominated the var_refine=1 predict cost
    (~2 s — the reduction was latency-bound, not bandwidth-bound). The
    tree does the same error-free accumulation in 14 halving passes
    (error ~ depth·eps in the lo channel, BETTER than the linear scan's
    k·eps worst case) at pure bandwidth cost.
    """
    k = h.shape[0]
    kp = 1 << max(0, (k - 1).bit_length())
    if kp != k:
        pad = ((0, kp - k),) + ((0, 0),) * (h.ndim - 1)
        h = jnp.pad(h, pad)
        l = jnp.pad(l, pad)
    while h.shape[0] > 1:
        nh, e = _two_sum(h[0::2], h[1::2])
        l = l[0::2] + l[1::2] + e
        h = nh
    return _fast_two_sum(h[0], l[0])


def _df_sum_tree_axis1(h: jnp.ndarray, l: jnp.ndarray):
    """Axis-1 variant of `_df_sum_tree` (reduce the contraction dimension
    of an (m, k) product array): same pairwise TwoSum tree, log₂(k)
    vectorized passes."""
    k = h.shape[1]
    kp = 1 << max(0, (k - 1).bit_length())
    if kp != k:
        h = jnp.pad(h, ((0, 0), (0, kp - k)))
        l = jnp.pad(l, ((0, 0), (0, kp - k)))
    while h.shape[1] > 1:
        nh, e = _two_sum(h[:, 0::2], h[:, 1::2])
        l = l[:, 0::2] + l[:, 1::2] + e
        h = nh
    return _fast_two_sum(h[:, 0], l[:, 0])


def gemv_df(Ah: jnp.ndarray, Al: jnp.ndarray, v: jnp.ndarray,
            rows: int = 4096, vl: jnp.ndarray | None = None):
    """EXACT double-float GEMV (Ah + Al)·(v + vl): TwoProd products on the
    VPU and a pairwise TwoSum tree over the contraction — NO accumulator
    floor at all (result error ~ depth·eps² ≈ 1e-13, vs ~1e-6 absolute
    for a chunk-compensated MXU GEMV at k = 16k, whose within-chunk f32
    accumulation was the measured floor of matern/composite double-mode
    posterior means — r3).

    `vl` (optional) is a double-float lo companion of v: the Ah·vl
    correction joins the error stream (Al·vl, ~1e-16 relative, is
    dropped). A SINGLE-f32 alpha caps the posterior mean at
    eps·‖K*‖‖α‖/‖μ‖ no matter how accurate the Gram entries are —
    measured as the 1.33e-6 se+matern mean plateau that survived the
    1e-10 entry rework (r3 batch F) — so the double path carries alpha
    as a df pair through refinement and the mean GEMV.

    Bandwidth-bound like any GEMV: ~3 streams of A instead of 1. Row
    chunking (static python loop) bounds the (rows, k) df transients.
    Returns (hi, lo) of shape (m,).

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas_gemv_df.gemv_df_fused): identical arithmetic with the
    TwoProd transients held in VMEM — one HBM read of (Ah, Al) per call
    instead of ~5 (the HLO form cost ~50-60 ms per call at n=16k, and
    the double path calls it four times per fit+predict).
    """
    if jax.default_backend() == "tpu":
        from stpy_tpu.ops.pallas_gemv_df import gemv_df_fused

        return gemv_df_fused(Ah, Al, v, vl=vl)
    v = jnp.asarray(v).reshape(-1)
    vlr = None if vl is None else jnp.asarray(vl).reshape(-1)
    m = Ah.shape[0]
    outs_h, outs_l = [], []
    for r0 in range(0, m, rows):
        ah, al = Ah[r0:r0 + rows], Al[r0:r0 + rows]
        ph, pe = _two_prod(ah, v[None, :])
        pe = pe + al * v[None, :]
        if vlr is not None:
            pe = pe + ah * vlr[None, :]
        oh, ol = _df_sum_tree_axis1(ph, pe)
        outs_h.append(oh)
        outs_l.append(ol)
    if len(outs_h) == 1:
        return outs_h[0], outs_l[0]
    return jnp.concatenate(outs_h), jnp.concatenate(outs_l)


def dot_diag_df(Ah: jnp.ndarray, Al: jnp.ndarray, Bh: jnp.ndarray,
                Bl: jnp.ndarray):
    """diag(Aᵀ B) for df A, B of shape (k, n): per-column compensated dot.

    Products are TwoProd'd elementwise on the VPU (exact f32 splits) and
    reduced over rows with a pairwise TwoSum tree (`_df_sum_tree`) —
    double-float accuracy for the quadratic forms where predictive
    variance suffers catastrophic cancellation (k** − k*ᵀK⁻¹k* with both
    terms O(1) and the difference O(s²)). O(k·n) work, bandwidth-bound.
    """
    ph, pe = _two_prod(Ah, Bh)
    pe = pe + Ah * Bl + Al * Bh
    return _df_sum_tree(ph, pe)
