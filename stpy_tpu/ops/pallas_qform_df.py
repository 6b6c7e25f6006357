"""Fused double-float quadratic form for refined predictive variance.

Computes, for the regularized Gram A = Th + Tl + s²I and an approximate
solve W0 ≈ A⁻¹ B of the df cross-Gram B = Bh + Bl (columns = test points):

    q[j] = Σ_a W0[a,j] · (B + R)[a,j],   R = B − A·W0

entirely inside one Pallas kernel — the (n, t) residual R is NEVER
materialized in HBM. The identity behind it (with w* = A⁻¹b, δ = w* − w0):

    q̃ = bᵀw0 + w0ᵀr = 2bᵀw0 − w0ᵀA w0 = bᵀA⁻¹b − δᵀAδ

so the quadratic form bᵀA⁻¹b — exactly the term predictive variance
subtracts, var = k** − k*ᵀA⁻¹k* — is recovered with error SECOND order in
the solve residual (δᵀAδ = rᵀA⁻¹r ≤ ||r||²/s², and ≥ 0: the estimate
under-shoots q, i.e. over-estimates variance — the conservative side).
A single HIGH-precision cho_solve for W0 therefore suffices where the r2
implementation iterated full df refinements of W (two extra n³ solves and
a scan-chunked compensated GEMM per pass, ~2 s at n=16k — VERDICT r2
item 6; this kernel + the identity deliver the same ≤5e-6 relative
variance in one fused pass).

Kernel numerics per (row-tile, col-tile) output block:
  * main product Th·W0 runs on the MXU at HIGHEST (f32-faithful bf16x6)
    and accumulates into a VMEM (hi, lo) pair with TwoSum after every
    k-step — the f32-accumulator floor (~1e-5 relative at k=16k, the
    measured variance plateau of the plain path) never appears;
  * the lo-Gram correction Tl·W0 (entries ~1e-8 of Th) needs only one
    bf16 MXU pass (DEFAULT) folded into the lo accumulator;
  * the s²W0 diagonal term joins the k-step where the k-tile crosses the
    row-tile; B arrives as (hi, lo) and the final u = B + R, the products
    W0 ⊙ u, and the column sums all run in error-free-transform df
    (pairwise TwoSum tree down to the 8-sublane granularity; the caller
    folds the last 8 rows).

HBM traffic = Th/Tl once per column-tile sweep + W0/B once per row-tile
sweep — ~35 GiB at n = t = 16k, fully hidden behind the ~280 ms of
HIGHEST MXU work. No reference counterpart: the torch reference runs f64
end-to-end (stpy/continuous_processes/gauss_procc.py:367-399) and never
needs compensated arithmetic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stpy_tpu.ops.pallas_gram_df import _make_eft


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _qform_kernel(s2_ref, th_ref, tl_ref, w0k_ref, w0a_ref, bh_ref, bl_ref,
                  qh_ref, ql_ref, acc_h, acc_l, *, k_steps, barriers,
                  main_precision=jax.lax.Precision.HIGHEST):
    two_sum, fast_two_sum, two_prod, df_add = _make_eft(barriers)
    at, kt = pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(at == 0, kt == 0))
    def _init_q():
        qh_ref[:] = jnp.zeros_like(qh_ref)
        ql_ref[:] = jnp.zeros_like(ql_ref)

    @pl.when(kt == 0)
    def _init_acc():
        acc_h[:] = jnp.zeros_like(acc_h)
        acc_l[:] = jnp.zeros_like(acc_l)

    # A·W0 k-step: hi product TwoSum-folded into the (hi, lo) accumulator;
    # bf16 lo-Gram pass straight into lo.
    dn = (((1,), (0,)), ((), ()))
    w0k = w0k_ref[:]

    def _fold_hi(p):
        sh, e = two_sum(acc_h[:], p)
        acc_h[:] = sh
        acc_l[:] = acc_l[:] + e

    if main_precision == "ozaki":
        # EXACT main product via Ozaki-style integer slicing (r4, VERDICT
        # task 1 — the winning scheme). Measured floors: HIGHEST and
        # split8 both sit at ~3e-6 rel-to-var because f32 rounds at the
        # GROSS pass's partial magnitudes (in-dot accumulation + per-chunk
        # output rounding) — the fix is to make the arithmetic exact, not
        # to add passes. Both tiles are sliced into power-of-two-scaled
        # 8-BIT INTEGERS carried in bf16 (|a_p| ≤ 128 after rounding, rows
        # of Th scaled by 2^{floor(log2 rowmax)}·2⁻⁷, columns of W0
        # likewise), so every MXU product is an integer ≤ 2¹⁵ and the f32
        # accumulation of a 256-deep dot stays ≤ 2²³ — EXACT. The
        # power-of-two rescale is exact in f32; TwoSum folds combine the
        # passes exactly. Passes p+q ≤ 3 (10 of 16): dropped terms are
        # ≤ 2⁻³² of gross; slice-truncation tails likewise ≤ 2⁻³²·scale.
        # ~10 DEFAULT passes ≈ 1.5x the 6-pass HIGHEST wall.
        th = th_ref[:]
        bk = th.shape[1]
        sub = 256 if bk % 256 == 0 else bk  # exactness bound: 2^15·2^8

        def pow2_below(m):
            # 2^{floor(log2 m)} via exp2/floor with an exactness guard
            # (log2's VPU rounding can mis-floor at exact powers of two;
            # the two corrections pin p ≤ m < 2p)
            p2 = jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))))
            p2 = jnp.where(p2 > m, p2 * 0.5, p2)
            p2 = jnp.where(2.0 * p2 <= m, p2 * 2.0, p2)
            return p2

        def slices4(a, scale):
            r = a / scale
            out = []
            for _ in range(4):
                s0 = jnp.round(r)
                out.append(s0.astype(jnp.bfloat16))
                r = (r - s0) * 256.0
            return out

        rmax = jnp.max(jnp.abs(th), axis=1, keepdims=True)
        a_sc = pow2_below(jnp.maximum(rmax, 1e-30)) * (2.0 ** -7)
        cmax = jnp.max(jnp.abs(w0k), axis=0, keepdims=True)
        b_sc = pow2_below(jnp.maximum(cmax, 1e-30)) * (2.0 ** -7)
        asl = slices4(th, a_sc)
        bsl = slices4(w0k, b_sc)

        def idot(a, b):
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        for p_i in range(4):
            for q_i in range(4):
                if p_i + q_i > 3:
                    continue
                d = 0.0
                for j in range(bk // sub):
                    d = d + idot(asl[p_i][:, j * sub:(j + 1) * sub],
                                 bsl[q_i][j * sub:(j + 1) * sub, :])
                # d: exact integer-valued f32 (each sub-dot exact ≤ 2²³,
                # their sum ≤ 2²⁴ ... guarded by sub; the cross-sub add
                # of two exact ≤2²³ integers is exact)
                val = (d * (a_sc * jnp.float32(2.0 ** (-8 * (p_i + q_i))))
                       ) * b_sc
                sh0, e0 = two_sum(acc_h[:], val)
                acc_h[:] = sh0
                acc_l[:] = acc_l[:] + e0
        p = None
    elif main_precision == "split8":
        # Manual 8-pass split GEMM (r4, VERDICT task 1). The r4 stage
        # decomposition (benchmarks/exp_r4_qform_stage.py) showed the
        # HIGHEST main product's error is FLAT in block_k (3.37e-6 →
        # 3.01e-6 rel-to-var at 512 → 128): it is dominated by bf16x6's
        # dropped 2⁻²⁴ cross terms (a1·b2 + a2·b1), not by f32
        # accumulation — no chunking can recover terms the scheme never
        # computes. Here both tiles are split into exact bf16 triples
        # (8+8+8 = 24 mantissa bits, a0+a1+a2 ≡ the f32 value) and all
        # terms through 2⁻²⁴ run as native DEFAULT bf16 MXU passes:
        #   a0·b0            sub-chunked at 128 deep, each partial
        #                    TwoSum-folded (this pass carries the gross
        #                    magnitude — within-dot f32 accumulation is
        #                    its only error, ∝ √depth);
        #   a0·b1 + a1·b0    2⁻⁸-scale, TwoSum-folded at full depth;
        #   a1·b1+a0·b2+a2·b0  2⁻¹⁶-scale, straight into the lo limb;
        #   a1·b2 + a2·b1    2⁻²⁴-scale (the terms HIGHEST drops), lo.
        # Per-product error is now ~2⁻³² (only a2·b2 dropped) and the
        # remaining accumulation error rides 128-deep partials. 8 passes
        # at the DEFAULT rate ≈ the 6-pass HIGHEST wall (~1.3x).
        th = th_ref[:]
        a0 = th.astype(jnp.bfloat16)
        r = th - a0.astype(jnp.float32)
        a1 = r.astype(jnp.bfloat16)
        a2 = (r - a1.astype(jnp.float32)).astype(jnp.bfloat16)
        b0 = w0k.astype(jnp.bfloat16)
        rb = w0k - b0.astype(jnp.float32)
        b1 = rb.astype(jnp.bfloat16)
        b2 = (rb - b1.astype(jnp.float32)).astype(jnp.bfloat16)

        def bdot(a, b):
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        bk = th.shape[1]
        sub = 128 if bk % 128 == 0 else bk
        for j in range(bk // sub):
            _fold_hi(bdot(a0[:, j * sub:(j + 1) * sub],
                          b0[j * sub:(j + 1) * sub, :]))
        _fold_hi(bdot(a0, b1) + bdot(a1, b0))
        acc_l[:] = acc_l[:] + ((bdot(a1, b1) + (bdot(a0, b2)
                                                + bdot(a2, b0)))
                               + (bdot(a1, b2) + bdot(a2, b1)))
        p = None
    elif main_precision == "bf16x3":
        # HIGH (bf16x3)-equivalent main product: Mosaic's dot_general only
        # accepts DEFAULT/HIGHEST, so emulate XLA's 3-pass scheme with an
        # explicit Veltkamp-style bf16 split of both tiles — a0·b0 +
        # a0·b1 + a1·b0, each a native bf16 MXU pass with f32
        # accumulation (~3x the HIGHEST rate; drops the a1·b1 term,
        # per-element error ~2⁻¹⁷·|Th|·|W0| vs HIGHEST's ~2⁻³²).
        th = th_ref[:]
        a0 = th.astype(jnp.bfloat16)
        a1 = (th - a0.astype(jnp.float32)).astype(jnp.bfloat16)
        b0 = w0k.astype(jnp.bfloat16)
        b1 = (w0k - b0.astype(jnp.float32)).astype(jnp.bfloat16)

        def bdot(a, b):
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        p = bdot(a0, b0) + (bdot(a0, b1) + bdot(a1, b0))
    else:
        p = jax.lax.dot_general(th_ref[:], w0k, dn,
                                preferred_element_type=jnp.float32,
                                precision=main_precision)
    corr = jax.lax.dot_general(tl_ref[:].astype(jnp.bfloat16),
                               w0k.astype(jnp.bfloat16), dn,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    if p is None:             # split8 already folded its passes
        acc_l[:] = acc_l[:] + corr
    else:
        sh, e = two_sum(acc_h[:], p)
        acc_h[:] = sh
        acc_l[:] = acc_l[:] + (e + corr)

    @pl.when(kt == k_steps - 1)
    def _finalize():
        w0a = w0a_ref[:]
        bh, bl = bh_ref[:], bl_ref[:]
        s2 = s2_ref[0, 0]
        # R = B − acc − s²·W0 in df, then u = B + R
        rh, re = two_sum(bh, -acc_h[:])
        rl = re + (bl - acc_l[:]) - s2 * w0a
        uh, ue = two_sum(bh, rh)
        ul = ue + bl + rl
        # products W0 ⊙ u in df
        ph, pe = two_prod(w0a, uh)
        pe = pe + w0a * ul
        # pairwise TwoSum tree over rows down to the 8-sublane granularity
        while ph.shape[0] > 8:
            m = ph.shape[0] // 2
            nh, he = two_sum(ph[:m], ph[m:])
            pe = pe[:m] + pe[m:] + he
            ph = nh
        sh_, e_ = two_sum(qh_ref[:], ph)
        qh_ref[:] = sh_
        ql_ref[:] = ql_ref[:] + (pe + e_)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret",
                              "main_precision")
)
def _qform_pallas(Th, Tl, W0k, W0a, Bh, Bl, s2, *, block_m: int,
                  block_n: int, block_k: int, interpret: bool,
                  main_precision=jax.lax.Precision.HIGHEST):
    """General (possibly rectangular) form: Th/Tl are (c, n) row strips of
    the df Gram, W0k is the FULL (n, t) solve (contraction operand), W0a /
    Bh / Bl are the strip's (c, t) rows (elementwise operands). The square
    call passes c == n and W0k is W0a. Output (8, tpad) partial sums over
    THIS strip's rows — the chunked caller df-folds strips."""
    c, n = Th.shape
    t = W0k.shape[1]

    cpad = _round_up(c, block_m)
    npad = _round_up(n, block_k)
    tpad = _round_up(t, block_n)

    Thp = jnp.pad(Th, ((0, cpad - c), (0, npad - n)))
    Tlp = jnp.pad(Tl, ((0, cpad - c), (0, npad - n)))
    W0kp = jnp.pad(W0k, ((0, npad - n), (0, tpad - t)))

    def padct(a):
        return jnp.pad(a, ((0, cpad - c), (0, tpad - t)))

    W0ap, Bhp, Blp = padct(W0a), padct(Bh), padct(Bl)
    jt_s, at_s, kt_s = tpad // block_n, cpad // block_m, npad // block_k

    kern = functools.partial(_qform_kernel, k_steps=kt_s, barriers=interpret,
                             main_precision=main_precision)
    qh, ql = pl.pallas_call(
        kern,
        grid=(jt_s, at_s, kt_s),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, a, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda j, a, k: (a, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda j, a, k: (a, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, a, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda j, a, k: (a, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda j, a, k: (a, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda j, a, k: (a, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, block_n), lambda j, a, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda j, a, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, tpad), jnp.float32),
            jax.ShapeDtypeStruct((8, tpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, block_n), jnp.float32),
            pltpu.VMEM((block_m, block_n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the finalize phase keeps ~6 (block_m, block_n) EFT transients
            # live on the kernel stack on top of the double-buffered input
            # windows — 20.75 MiB scoped at 512-tiles, over Mosaic's
            # conservative 16 MiB default budget (measured compile OOM,
            # r3 batch C/D). The chip has 128 MiB VMEM; raise the scoped
            # budget instead of shrinking tiles (smaller tiles cost MXU
            # efficiency on the HIGHEST main product).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=7 * cpad * npad * tpad,   # bf16x6 main + 1 lo pass, 2mnk/2
            bytes_accessed=4 * (2 * cpad * npad * jt_s
                                + (npad + 3 * cpad) * tpad * at_s),
            transcendentals=0,
        ),
        interpret=interpret,
    )(s2.reshape(1, 1).astype(jnp.float32), Thp, Tlp, W0kp, W0ap, Bhp, Blp)

    # fold the 8 sublane partials in barrier-guarded df (tiny: (8, t))
    two_sum, fast_two_sum, _, _ = _make_eft(True)
    h, l = qh, ql
    while h.shape[0] > 1:
        m = h.shape[0] // 2
        nh, e = two_sum(h[:m], h[m:])
        l = l[:m] + l[m:] + e
        h = nh
    oh, ol = fast_two_sum(h[0], l[0])
    return oh[:t], ol[:t]


def _qform_f64(Th, Tl, W0k, W0a, Bh, Bl, s2):
    """Exact f64 evaluation of the same estimate (CPU-x64 test contract):
    q̃ = Σ_a W0a ⊙ (2B − Th·W0k − s²W0a), returned as an (hi, lo) split in
    the input dtype. Rectangular (row-strip) form; square callers pass
    W0k twice."""
    A = Th.astype(jnp.float64) + Tl.astype(jnp.float64)
    Wk = W0k.astype(jnp.float64)
    Wa = W0a.astype(jnp.float64)
    B = Bh.astype(jnp.float64) + Bl.astype(jnp.float64)
    u = 2.0 * B - A @ Wk - s2.astype(jnp.float64) * Wa
    q = jnp.sum(Wa * u, axis=0)
    hi = q.astype(jnp.float32).astype(jnp.float64)
    dt = jnp.asarray(Th).dtype
    return hi.astype(dt), (q - hi).astype(dt)


def qform_refined(Th, Tl, W0, Bh, Bl, s, *, block_m=512, block_n=512,
                  block_k=512, interpret=None,
                  main_precision="ozaki"):
    """q ≈ diag(Bᵀ (Th+Tl+s²I)⁻¹ B) as a df pair (qh, ql), given an
    approximate solve W0 — second-order-accurate in W0's residual (see
    module docstring). Th/Tl: (n, n) df Gram; W0, Bh, Bl: (n, t); s: noise
    std (scalar). On CPU with x64 the exact f64 fallback runs instead
    (same contract as ops/pallas_gram_df.gram_df).

    Cubic 512 tiles keep 8 windows resident (2 A-tiles, 4 (n,t)-tiles,
    2 scratch) plus ~6 finalize EFT transients — ~21 MiB of scoped VMEM,
    over Mosaic's conservative 16 MiB default; the pallas_call raises
    `vmem_limit_bytes` to 64 MiB (the chip has 128 MiB) rather than
    shrinking tiles, which was measured to make the scoped footprint
    WORSE (bk=256 → 20.75 MiB vs bk=512 → 18.76 MiB) while cutting the
    HIGHEST main product's MXU efficiency."""
    return qform_refined_strip(
        Th, Tl, W0, W0, Bh, Bl, s, block_m=block_m, block_n=block_n,
        block_k=block_k, interpret=interpret,
        main_precision=main_precision,
    )


def qform_refined_strip(Th, Tl, W0k, W0a, Bh, Bl, s, *, block_m=512,
                        block_n=512, block_k=512, interpret=None,
                        main_precision="ozaki"):
    """Row-strip form of `qform_refined` for matrix-free (beyond-HBM)
    variance (r5, VERDICT task 5): Th/Tl are the (c, n) df Gram rows of
    ONE row chunk, W0k the full (n, t) solve, W0a/Bh/Bl the chunk's (c, t)
    rows. Returns this strip's PARTIAL (qh, ql) column sums; callers
    df-fold strips with TwoSum (the decomposition over rows is exact —
    q = Σ_strips Σ_{a∈strip} W0[a] ⊙ (2B − A·W0 − s²W0)[a])."""
    Th = jnp.asarray(Th)
    s2 = jnp.asarray(s) ** 2
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
    if (not on_tpu) and (not interpret) and not jax.config.jax_enable_x64:
        interpret = True
    if (not on_tpu) and jax.config.jax_enable_x64 and not interpret:
        return _qform_f64(Th, Tl, W0k, W0a, Bh, Bl, s2)
    f32 = jnp.float32
    return _qform_pallas(
        Th.astype(f32), jnp.asarray(Tl, f32), jnp.asarray(W0k, f32),
        jnp.asarray(W0a, f32), jnp.asarray(Bh, f32), jnp.asarray(Bl, f32),
        s2, block_m=block_m, block_n=block_n, block_k=block_k,
        interpret=bool(interpret), main_precision=main_precision,
    )
