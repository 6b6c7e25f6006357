"""Double-float (hi, lo) Gram kernels (SE + Matérn families) on TPU.

Why this exists: the TPU has no f64, and an f32 Gram caps the exact-GP
posterior-mean accuracy at ~1e-6 rtol vs an f64 reference at n=16k — the
*storage rounding* of K itself is the floor (measured: a perfect
f64-rounded-to-f32 K plateaus at 1.06e-6 mean rel err even with iterative
refinement; adding the exact lo part takes it to 5.9e-7, see
benchmarks/exp_roofline.py). These kernels compute each Gram entry as an
unevaluated pair (hi, lo) with hi + lo = k(x, y) to ~1e-9 relative,
entirely in f32 VPU arithmetic:

  * coordinates are pre-scaled by 1/γ in double-float OUTSIDE the kernel
    (elementwise jnp, cheap) so ARD lengthscales are free;
  * squared distances accumulate with error-free transformations
    (TwoSum / Dekker TwoProd — no FMA primitive is exposed, so products
    split via the 2^12+1 Veltkamp constant);
  * SE: exp uses range reduction z = k·ln2 + r with a split ln2 (the high
    part has an 11-bit mantissa so k·ln2_hi is exact for |k| ≤ 128) and
    e^r = 1 + r + r²/2 + r³·Q(r) with Q in plain f32 — the r³ prefactor
    keeps the f32 polynomial error below ~1e-9 of e^r;
  * Matérn ν ∈ {½, 3/2, 5/2} (and laplace ≡ ν=½): t = √(2ν·sq) via a
    df sqrt (one exact-residual Newton correction), the polynomial
    prefactor (1, 1+t, 1+t+t²/3) in df, and the same df exp on −t;
  * 2^k is built by exponent-field bitcast (exact; entries with
    z < -87 flush to exactly 0 — they are < 1.6e-38 anyway).

Used by the exact-GP "double" precision path: factor A_hi once, then
iterative refinement with residuals r = y - (A_hi + A_lo + s²I)·α converges
to the f64-quality solution. Composite kernels (sums/products of these
atoms) combine (hi, lo) pairs with the barrier-guarded df algebra at the
call site (models/exact_gp.py). Reference semantics: the torch reference
is float64 end-to-end for EVERY kernel
(stpy/continuous_processes/gauss_procc.py:152,367-399); this is how the
TPU rebuild matches it without f64 hardware.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634
_LN2_HI = 0.693359375                 # 11-bit mantissa: k*LN2_HI exact
_LN2_REST = -2.1219444005469057e-04   # ln2 - LN2_HI
_SPLIT = 4097.0                       # Veltkamp constant for f32 (2^12 + 1)
_SIXTH = (float(np.float32(1.0 / 6.0)),
          float(np.float64(1.0 / 6.0) - np.float64(np.float32(1.0 / 6.0))))

# df Pallas path is VPU-bound with a static unroll over feature dims; the
# VMEM x-block is lane-padded to 128 either way, so d ≤ 128 costs no extra
# memory (r2 capped this at 32; lifted per VERDICT r2 item 4). d > 128
# falls back to a row-chunked HLO implementation of the same arithmetic.
DF_MAX_D = 128


def _split_f64(v: float) -> tuple[float, float]:
    """Host-side split of an f64 constant into (f32-representable hi, lo)."""
    hi = np.float32(v)
    return float(hi), float(np.float64(v) - np.float64(hi))


def _eft_guard(use_barriers: bool):
    """The intermediate-value guard for HLO-path EFT code.

    Two independent hazards, two guards. `optimization_barrier` stops the
    HLO algebraic simplifier from cancelling compensation terms
    ((a+b)-a -> b). `reduce_precision(8, 23)` — the identity rounding for
    f32 — survives to the backend and stops the CPU LLVM emitter from
    FMA-contracting a duplicated mul into a consumer add: XLA fusion
    rematerializes cheap broadcast-muls into every consumer fusion, where
    add(mul(A,F), pe) becomes fma(A, F, pe) and the EFT sees an exact
    product where it computed a rounded one (measured 3e-8 per op on
    broadcast operands — the r4 generic-df dot floor; the barrier alone
    does NOT survive to the backend)."""
    if not use_barriers:
        return lambda x: x
    return lambda x: jax.lax.optimization_barrier(
        jax.lax.reduce_precision(x, 8, 23))


def _make_eft(use_barriers: bool):
    """Error-free-transformation helpers, optionally wrapped in
    optimization barriers.

    The transforms depend on the EXACT rounded value of intermediates like
    s = fl(a + b); XLA's HLO algebraic simplifier happily rewrites
    (a + b) - a -> b, silently destroying the error term (measured: the df
    accumulation degrades 1.2e-14 -> 3.8e-8 under jit without barriers).
    Barriers are needed wherever the HLO pipeline runs: regular jit code
    and interpret-mode Pallas. The Mosaic TPU kernel path lowers the jaxpr
    directly (no HLO simplifier) and does NOT implement
    optimization_barrier — so the compiled kernel uses the bare forms
    (TPU accuracy is asserted against the f64 host in tests).
    """
    ob = _eft_guard(use_barriers)

    def two_sum(a, b):
        s = ob(a + b)
        v = ob(s - a)
        e = ob((a - (s - v)) + (b - v))
        return s, e

    def fast_two_sum(a, b):  # requires |a| >= |b| (or a == 0)
        s = ob(a + b)
        e = ob(b - (s - a))
        return s, e

    def two_prod(a, b):
        p = ob(a * b)
        ca = ob(a * _SPLIT)
        ah = ob(ca - (ca - a))
        # al/bl MUST be barriered too: with a and b the SAME tensor (x·x,
        # e.g. integer_pow), CSE makes ah≡bh, al≡bl and the simplifier
        # reassociates ah+al → a inside e, collapsing the error term
        # (measured: df x² error 0 → 4.3e-7 abs without these barriers).
        al = ob(a - ah)
        cb = ob(b * _SPLIT)
        bh = ob(cb - (cb - b))
        bl = ob(b - bh)
        # e is ALSO barriered: a downstream consumer (fast_two_sum in
        # df_mul) computes e' = e - (s - p); with e's expression visible
        # the simplifier cancels the -p inside e against the +p outside,
        # reassociating e' to (ah·bh + …) - s — algebraically equal but
        # numerically ~ulp(a·b) garbage (measured: composed df_mul
        # error 0 → 4.3e-7 abs). Opaque EFT outputs keep every
        # composition hermetic.
        e = ob(((ah * bh - p) + ah * bl + al * bh) + al * bl)
        return p, e

    def df_add(xh, xl, yh, yl):
        sh, se = two_sum(xh, yh)
        return fast_two_sum(sh, se + xl + yl)

    return two_sum, fast_two_sum, two_prod, df_add


# module-level variants run under regular jit (HLO pipeline) -> barriers on
_two_sum, _fast_two_sum, _two_prod, _df_add = _make_eft(True)


def _host_veltkamp32(c: float) -> tuple[float, float, float]:
    """(c32, hi, lo) Veltkamp split of an f32 constant, computed on HOST
    in np.float32 semantics.

    NEVER write the split of a compile-time constant as in-kernel
    arithmetic: Mosaic constant-folds `ca - (ca - c)` in wider precision,
    which collapses the split (hi = c, lo = 0) and silently destroys
    TwoProd's error term — measured as a flat eps/2 ≈ 5.9e-8 relative
    error on t = √(2ν·sq) that capped matern df Gram entries at 5.4e-8
    and composite posterior means at 1.25e-6 (r3 batch P3: in-kernel
    split 5.9e-8 vs host-presplit 1.9e-14, same kernel otherwise)."""
    c32 = np.float32(c)
    ca = np.float32(c32 * np.float32(_SPLIT))
    hh = np.float32(ca - np.float32(ca - c32))
    hl = np.float32(c32 - hh)
    return float(c32), float(hh), float(hl)


def _make_two_prod_const(use_barriers: bool):
    """TwoProd(a, c) for a TENSOR a and a compile-time f32 constant c
    passed as `_host_veltkamp32(c)` output — only the tensor side is
    split in-kernel (see _host_veltkamp32 for why)."""
    ob = _eft_guard(use_barriers)

    def two_prod_const(a, c_split):
        c32, chh, chl = c_split
        p = ob(a * c32)
        ca = ob(a * _SPLIT)
        ah = ob(ca - (ca - a))
        al = a - ah
        e = ((ah * chh - p) + ah * chl + al * chh) + al * chl
        return p, e

    return two_prod_const


_SIXTH_SPLIT = _host_veltkamp32(_SIXTH[0])


def _df_mul(xh, xl, yh, yl):
    """Barrier-guarded elementwise df product (for '*' kernel algebra)."""
    ph, pe = _two_prod(xh, yh)
    return _fast_two_sum(ph, pe + xh * yl + xl * yh)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _df_exp(wh, wl, eft, bitcast, tpc=None):
    """df e^w for w ≤ 0 via range reduction; entries with w < -87 flush to
    exactly 0. `bitcast(int32_arr) -> f32_arr` builds 2^k exactly. `tpc`:
    tensor-x-constant TwoProd (_make_two_prod_const; defaults to the
    barriered HLO variant)."""
    two_sum, fast_two_sum, two_prod, df_add = eft
    if tpc is None:
        tpc = _make_two_prod_const(True)
    live = wh > -87.0
    k = jnp.round(wh * _LOG2E)
    rh, re = two_sum(wh, -(k * _LN2_HI))
    rl = re - k * _LN2_REST + wl
    rh, rl = fast_two_sum(rh, rl)

    sqh, sqe = two_prod(rh, rh)
    sqe = sqe + 2.0 * rh * rl
    # e^r = 1 + r + r²/2 + r³/6 + r⁴·Q2(r) with 1, r, r²/2, r³/6 all in df
    # and only the quartic tail in plain f32. Keeping the cubic term in f32
    # (the r2 scheme: c3 = r³·Q(r)) left a ~eps·r³/6 ≈ 5e-10 rounding as
    # the DOMINANT df-Gram entry error — measured 0.5-1.3e-9 per entry,
    # which through mean = K*·alpha floored composite-kernel posterior
    # means at 1.3e-6 (r3 batch D). With the cubic in df the entry error
    # drops to the quartic tail's rounding, ~eps·r⁴/24 ≈ 2e-11.
    q2 = 1.0 / 362880.0                      # through r⁹: truncation ~r¹⁰/10!
    for ccoef in (1.0 / 40320.0, 1.0 / 5040.0, 1.0 / 720.0, 1.0 / 120.0,
                  1.0 / 24.0):
        q2 = q2 * rh + ccoef
    cbh, cbe = two_prod(sqh, rh)             # r³ in df
    cbe = cbe + (sqe * rh + sqh * rl)
    c4 = cbh * rh * q2                       # r⁴·Q2, f32 is plenty
    sxh, sxl = _SIXTH
    t1h, t1e = tpc(cbh, _SIXTH_SPLIT)        # r³/6 in df
    t1e = t1e + (cbh * sxl + cbe * sxh)
    eh, el = fast_two_sum(1.0, rh)
    el = el + rl
    eh, el = df_add(eh, el, 0.5 * sqh, 0.5 * sqe)
    eh, el = df_add(eh, el, t1h, t1e + c4)
    eh, el = fast_two_sum(eh, el)

    # exact 2^k scaling via exponent bitcast (k in [-126, 0] when live)
    ki = jnp.clip(k, -126.0, 126.0).astype(jnp.int32)
    pw = bitcast(jax.lax.shift_left(ki + 127, jnp.int32(23)))
    eh = jnp.where(live, eh * pw, 0.0)
    el = jnp.where(live, el * pw, 0.0)
    return eh, el


def _df_entry(acc_h, acc_l, kh, kl, *, family, nu, eft, bitcast, tpc=None):
    """(hi, lo) kernel entry from the df squared distance in 1/γ-scaled
    coordinates. family: "se" -> κ·e^{-sq/2}; "matern" ->
    κ·P_ν(t)·e^{-t}, t = √(2ν·sq) (ν=½ is laplace/exp(-r/γ)). `tpc`:
    tensor-x-constant TwoProd (see _host_veltkamp32 for why the generic
    two_prod must not see compile-time constants in Mosaic)."""
    two_sum, fast_two_sum, two_prod, df_add = eft
    if tpc is None:
        tpc = _make_two_prod_const(True)

    if family == "se":
        eh, el = _df_exp(-0.5 * acc_h, -0.5 * acc_l, eft, bitcast, tpc)
    elif family == "matern":
        # t = √(2ν)·√sq in df: f32 sqrt seed + exact-residual Newton steps
        # whose corrections are MULTIPLY-ONLY. The VPU's hardware
        # sqrt/divide are only ~2^-8 approximations, so a divide in the
        # correction floors the pair at δ_div·δ₁ ≈ 2^-8·2^-16 ≈ 5.9e-8 —
        # measured EXACTLY as the flat 5.9e-8 relative t error (r3 batch
        # P stage isolation) that surfaced as the 5.4e-8 matern entry
        # error and the 1.25e-6 composite posterior-mean plateau (batches
        # I/I3). Fix: refine the reciprocal r ≈ 1/(2√sq) itself by
        # Newton (r ← r·(2 − x·r), error squares to ~2^-16, and the
        # residual 2 − x·r is Sterbenz-exact), re-centering it after the
        # first sqrt update; both sqrt corrections then multiply by r:
        #   step 1: δ₁ ≈ f32 add rounding ≈ 1.2e-7,
        #   step 2 (lo limb): sl error ≈ r_err·|sl| ≈ 1.5e-5·1.2e-7·√sq
        # — the (hi, lo) pair lands ~2e-12 relative (vs 1.6e-10 for the
        # HLO path's IEEE ops).
        safe = acc_h > 1e-36
        ah = jnp.maximum(acc_h, 1e-36)
        sh = jnp.sqrt(ah)
        x2 = 2.0 * sh
        r = 1.0 / x2
        r = r * (2.0 - x2 * r)
        p, pe = two_prod(sh, sh)
        sh = sh + ((ah - p) - pe) * r
        r = r * (2.0 - (2.0 * sh) * r)
        p, pe = two_prod(sh, sh)
        err = ((ah - p) - pe) + acc_l
        sl = err * r
        sh = jnp.where(safe, sh, 0.0)
        sl = jnp.where(safe, sl, 0.0)
        ch, cl = _split_f64(math.sqrt(2.0 * nu))
        th, te = tpc(sh, _host_veltkamp32(ch))
        te = te + sh * cl + ch * sl
        th, tl = fast_two_sum(th, te)

        eh, el = _df_exp(-th, -tl, eft, bitcast, tpc)

        if nu == 1.5:                      # P = 1 + t
            ph, pe2 = two_sum(1.0, th)
            ph, pl_ = fast_two_sum(ph, pe2 + tl)
        elif nu == 2.5:                    # P = 1 + t + t²/3
            qh, qe = two_prod(th, th)
            qe = qe + 2.0 * th * tl
            oth, otl = _split_f64(1.0 / 3.0)
            q3h, q3e = tpc(qh, _host_veltkamp32(oth))
            q3e = q3e + qh * otl + qe * oth
            q3h, q3l = fast_two_sum(q3h, q3e)
            ph, pe2 = two_sum(1.0, th)
            ph, pl_ = fast_two_sum(ph, pe2 + tl)
            ph, pl_ = df_add(ph, pl_, q3h, q3l)
        else:                              # ν = ½: P = 1
            ph, pl_ = None, None
        if ph is not None:
            rh_, re_ = two_prod(eh, ph)
            re_ = re_ + eh * pl_ + el * ph
            eh, el = fast_two_sum(rh_, re_)
    else:  # pragma: no cover - guarded at dispatch
        raise NotImplementedError(family)

    oh, oe = two_prod(eh, kh)
    oe = oe + eh * kl + el * kh
    return fast_two_sum(oh, oe)


def _gram_df_kernel(kap_ref, xh_ref, xl_ref, yh_ref, yl_ref,
                    oh_ref, ol_ref, *, d, barriers, family, nu):
    eft = _make_eft(barriers)
    two_sum, fast_two_sum, two_prod, df_add = eft
    xh, xl = xh_ref[:], xl_ref[:]          # (TM, dp)
    yh, yl = yh_ref[:], yl_ref[:]          # (dp, TN), pre-transposed
    acc_h = jnp.zeros((xh.shape[0], yh.shape[1]), jnp.float32)
    acc_l = jnp.zeros_like(acc_h)
    for c in range(d):                     # static unroll (d <= DF_MAX_D)
        dh, de = two_sum(xh[:, c:c + 1], -yh[c:c + 1, :])
        dl = de + (xl[:, c:c + 1] - yl[c:c + 1, :])
        sh, se = two_prod(dh, dh)
        se = se + 2.0 * dh * dl
        acc_h, acc_l = df_add(acc_h, acc_l, sh, se)

    oh, ol = _df_entry(
        acc_h, acc_l, kap_ref[0, 0], kap_ref[0, 1],
        family=family, nu=nu, eft=eft,
        bitcast=lambda i: pltpu.bitcast(i, jnp.float32),
        tpc=_make_two_prod_const(barriers),
    )
    oh_ref[:] = oh
    ol_ref[:] = ol


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "interpret", "family", "nu"),
)
def _gram_df_pallas(xh, xl, yh, yl, kappa_df,
                    *, block_m: int, block_n: int, interpret: bool,
                    family: str, nu: float):
    n, d = xh.shape
    m = yh.shape[0]
    dp = _round_up(max(d, 1), 8)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)

    def padx(a):
        return jnp.pad(a, ((0, np_ - n), (0, _round_up(d, 128) - d)))

    def pady(a):
        return jnp.pad(a, ((0, mp - m), (0, dp - d))).T  # (dp, mp)

    # barriers only where the HLO simplifier runs (interpret mode); the
    # Mosaic TPU lowering has no optimization_barrier and no such rewrites
    kern = functools.partial(_gram_df_kernel, d=d, barriers=interpret,
                             family=family, nu=nu)
    oh, ol = pl.pallas_call(
        kern,
        grid=(np_ // block_m, mp // block_n),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, _round_up(d, 128)), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, _round_up(d, 128)), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, mp), jnp.float32),
            jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(40 * d + 80) * np_ * mp,
            bytes_accessed=4 * (2 * np_ * dp + 2 * mp * dp + 2 * np_ * mp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(kappa_df, padx(xh), padx(xl), pady(yh), pady(yl))
    return oh[:n, :m], ol[:n, :m]


@functools.partial(jax.jit, static_argnames=("family", "nu", "chunk"))
def _gram_df_hlo(xh, xl, yh, yl, kappa_df, *, family, nu, chunk=1024):
    """Row-chunked HLO (barrier-guarded) df Gram for d > DF_MAX_D — the
    same arithmetic as the Pallas kernel, O(chunk·m) temporaries."""
    eft = _make_eft(True)
    two_sum, fast_two_sum, two_prod, df_add = eft
    n, d = xh.shape
    m = yh.shape[0]
    cb = min(chunk, n)
    nb = -(-n // cb)
    pad = nb * cb - n
    xhb = jnp.pad(xh, ((0, pad), (0, 0))).reshape(nb, cb, d)
    xlb = jnp.pad(xl, ((0, pad), (0, 0))).reshape(nb, cb, d)

    def bitcast(i):
        return jax.lax.bitcast_convert_type(i, jnp.float32)

    def body(args):
        xhc, xlc = args
        acc_h = jnp.zeros((cb, m), jnp.float32)
        acc_l = jnp.zeros_like(acc_h)

        def dim_body(c, carry):
            ah, al = carry
            dh, de = two_sum(
                jax.lax.dynamic_slice_in_dim(xhc, c, 1, 1),
                -jax.lax.dynamic_slice_in_dim(yh, c, 1, 1).T,
            )
            dl = de + (jax.lax.dynamic_slice_in_dim(xlc, c, 1, 1)
                       - jax.lax.dynamic_slice_in_dim(yl, c, 1, 1).T)
            sh, se = two_prod(dh, dh)
            se = se + 2.0 * dh * dl
            return df_add(ah, al, sh, se)

        acc_h, acc_l = jax.lax.fori_loop(0, d, dim_body, (acc_h, acc_l))
        return _df_entry(acc_h, acc_l, kappa_df[0, 0], kappa_df[0, 1],
                         family=family, nu=nu, eft=eft, bitcast=bitcast)

    oh, ol = jax.lax.map(body, (xhb, xlb))
    return (oh.reshape(-1, m)[:n], ol.reshape(-1, m)[:n])


def _df_inv(g):
    """Double-float reciprocal of f32 g via one exact Newton residual."""
    g = jnp.asarray(g, jnp.float32)
    ih = 1.0 / g
    p, pe = _two_prod(g, ih)
    r = (1.0 - p) - pe
    return ih, ih * r


def _df_inv_pair(gh, gl):
    """Double-float reciprocal of the df PAIR gh + gl (barrier-guarded
    HLO path): f32 seed + one Newton step with the residual computed in
    df — r = r0·(1 + e), e = 1 − (gh+gl)·r0. Final pair ~eps² relative.

    This is how a TRACED hyperparameter keeps its f64 meaning through the
    df tier: params_dict stores f32(γ), the value-keyed lo shadow
    (KernelFunction.params_with_lo) restores γ − f32(γ), and this inverse
    reproduces 1/γ — without it the df Gram represents k(x·f32(1/γ)),
    a δγ-relative shift whose max abs entry error lands exactly at
    t = 1+√3 (the r3 'matern anomaly', benchmarks/exp_r4_anomaly.py)."""
    gh = jnp.asarray(gh, jnp.float32)
    gl = jnp.asarray(gl, jnp.float32)
    r0 = 1.0 / gh
    p, pe = _two_prod(gh, r0)
    e = ((1.0 - p) - pe) - gl * r0
    return _fast_two_sum(r0, r0 * e)


def _df_scale_coords(x, inv_h, inv_l):
    """Elementwise df product x*(inv_h+inv_l) -> (hi, lo), plain jnp."""
    x = jnp.asarray(x, jnp.float32)
    p, pe = _two_prod(x, inv_h)
    return _fast_two_sum(p, pe + x * inv_l)


def _f64_reference(x, y, gamma, kappa, family, nu, gamma_lo=None,
                   kappa_lo=None):
    """Exact f64 (hi, lo) on CPU-x64 backends — the test-suite contract."""
    g64 = jnp.asarray(
        np.asarray(gamma, np.float64)
        if isinstance(gamma, (int, float, np.ndarray, np.floating))
        else gamma, jnp.float64,
    ).reshape(-1)
    if gamma_lo is not None:
        g64 = g64 + jnp.asarray(gamma_lo, jnp.float64).reshape(-1)
    if kappa_lo is not None:
        kappa = jnp.asarray(kappa, jnp.float64) + jnp.asarray(
            kappa_lo, jnp.float64)
    x64 = jnp.asarray(x, jnp.float64)
    y64 = jnp.asarray(y, jnp.float64)
    sq = jnp.sum(((x64[:, None, :] - y64[None, :, :]) / g64) ** 2, axis=-1)
    if family == "se":
        K = jnp.exp(-0.5 * sq)
    else:
        t = jnp.sqrt(2.0 * nu * sq + 1e-300)
        if nu == 1.5:
            P = 1.0 + t
        elif nu == 2.5:
            P = 1.0 + t + t * t / 3.0
        else:
            P = 1.0
        K = P * jnp.exp(-t)
    K = jnp.asarray(kappa, jnp.float64) * K
    hi = K.astype(jnp.float32).astype(jnp.float64)
    return hi, K - hi


def gram_df(x, y, gamma, kappa=1.0, *, family="se", nu=1.5,
            block_m=256, block_n=256, interpret=None,
            gamma_lo=None, kappa_lo=None):
    """Double-float Gram: returns (hi, lo) f32 arrays with
    hi + lo = k(x, y) to ~1e-9 relative.

    family "se": κ·exp(-||x-y||²/(2γ²)); family "matern": κ·P_ν(t)·e^{-t}
    with t = √(2ν)·||x-y||/γ and ν ∈ {0.5, 1.5, 2.5} (ν=0.5 ≡ laplace).
    gamma may be a scalar or per-dim (ARD) array. On non-TPU backends with
    x64 enabled this falls back to an exact f64 computation split into
    (hi, lo) — same contract, used by the CPU test-suite.

    gamma_lo / kappa_lo: optional f32 lo limbs restoring the f64 meaning
    of TRACED hyperparameters (γ = γ_hi + γ_lo). Without them a traced γ
    is interpreted at its f32-rounded value — a δγ ≈ 2e-8 semantic shift
    for f32-inexact values like 1.1, whose max abs entry error peaks at
    t = 1+√3 (see _df_inv_pair / benchmarks/exp_r4_anomaly.py).
    """
    if family == "matern" and nu not in (0.5, 1.5, 2.5):
        raise NotImplementedError(
            f"df matern supports nu in (0.5, 1.5, 2.5), got {nu}"
        )
    if family not in ("se", "matern"):
        raise NotImplementedError(f"df gram family {family!r}")
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    d = x.shape[1]
    g = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32).reshape(-1), (d,))
    nu = float(nu)

    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
    if (not on_tpu) and (not interpret) and not jax.config.jax_enable_x64:
        interpret = True  # CPU f32: exercise the actual kernel, interpreted
    if (not on_tpu) and jax.config.jax_enable_x64 and not interpret:
        return _f64_reference(x, y, gamma, kappa, family, nu,
                              gamma_lo=gamma_lo, kappa_lo=kappa_lo)

    # concrete host parameters keep their f64 meaning: split 1/γ and κ in
    # f64 on host; traced parameters fall back to f32-rounded semantics
    if isinstance(gamma, (int, float, np.ndarray, np.floating)):
        g64 = np.broadcast_to(np.asarray(gamma, np.float64).reshape(-1), (d,))
        inv64 = 1.0 / g64
        # split ENTIRELY in numpy f64: mixing a numpy f64 with a jnp f32
        # array here promotes the subtraction to f32 under the TPU's
        # default (x64-off) dtype rules and silently ZEROES the lo limb —
        # the 1.8e-8 "matern anomaly" of r3 (every f32-inexact γ shifted
        # the represented kernel to k(x·f32(1/γ)); peak abs entry error
        # δγ·t²(1+t)e^{-t}/3 at t = 1+√3, benchmarks/exp_r4_anomaly.py)
        ih_np = inv64.astype(np.float32)
        il_np = (inv64 - ih_np.astype(np.float64)).astype(np.float32)
        ih, il = jnp.asarray(ih_np), jnp.asarray(il_np)
    elif gamma_lo is not None:
        gl = jnp.broadcast_to(
            jnp.asarray(gamma_lo, jnp.float32).reshape(-1), (d,))
        ih, il = _df_inv_pair(g, gl)
    else:
        ih, il = _df_inv(g)
    xh, xl = _df_scale_coords(x.astype(jnp.float32), ih, il)
    yh, yl = _df_scale_coords(y.astype(jnp.float32), ih, il)
    if isinstance(kappa, (int, float, np.ndarray, np.floating)):
        k64 = np.float64(kappa)
        kh = np.float32(k64)
        kappa_df = jnp.asarray(
            np.array([[kh, np.float32(k64 - np.float64(kh))]], np.float32)
        )
    else:
        kap = jnp.asarray(kappa, jnp.float32).reshape(())
        kap_lo = (jnp.asarray(kappa_lo, jnp.float32).reshape(())
                  if kappa_lo is not None else jnp.zeros((), jnp.float32))
        kappa_df = jnp.stack([kap, kap_lo]).reshape(1, 2)
    if d > DF_MAX_D:
        return _gram_df_hlo(xh, xl, yh, yl, kappa_df, family=family, nu=nu)
    return _gram_df_pallas(
        xh, xl, yh, yl, kappa_df,
        block_m=block_m, block_n=block_n, interpret=bool(interpret),
        family=family, nu=nu,
    )


def gram_se_df(x, y, gamma, kappa=1.0, *, block_m=256, block_n=256,
               interpret=None):
    """Double-float SE Gram (see `gram_df`)."""
    return gram_df(x, y, gamma, kappa, family="se",
                   block_m=block_m, block_n=block_n, interpret=interpret)


def gram_matern_df(x, y, gamma, kappa=1.0, *, nu=1.5,
                   block_m=256, block_n=256, interpret=None):
    """Double-float Matérn Gram, ν ∈ {0.5, 1.5, 2.5} (see `gram_df`)."""
    return gram_df(x, y, gamma, kappa, family="matern", nu=nu,
                   block_m=block_m, block_n=block_n, interpret=interpret)
