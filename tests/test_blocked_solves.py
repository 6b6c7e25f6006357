"""Blocked triangular solves (batched leaf inverses, alpha folding) and the
fused df quadratic form behind GaussianProcess(var_refine=1).

Reference parity: the torch reference solves these systems with f64
`torch.linalg` calls (stpy/continuous_processes/gauss_procc.py:367-399);
here the blocked GEMM formulations must reproduce XLA's triangular solves
to roundoff, and the second-order quadratic-form estimate must recover
b'A^-1 b with error quadratic in the solve residual.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import (
    cho_solve_blocked,
    diag_block_invs,
    tri_solve_blocked,
    tri_solve_blocked_t,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    K = A @ A.T + n * np.eye(n)
    return jnp.asarray(np.linalg.cholesky(K))


@pytest.mark.parametrize("n,nb", [(512, 128), (700, 256)])
def test_blocked_solves_match_xla(n, nb):
    """Forward / upper / cho blocked solves (batched leaves, incl. the pad
    path) match XLA's triangular solve to roundoff."""
    L = _spd(n)
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((n, 33)))

    X = tri_solve_blocked(L, B, nb=nb)
    Xref = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    assert float(jnp.max(jnp.abs(X - Xref))) < 1e-10

    Xu = tri_solve_blocked_t(L, B, nb=nb)
    Xuref = jax.scipy.linalg.solve_triangular(L.T, B, lower=False)
    assert float(jnp.max(jnp.abs(Xu - Xuref))) < 1e-10

    a = cho_solve_blocked(L, B[:, :2], nb=nb)
    aref = jax.scipy.linalg.cho_solve((L, True), B[:, :2])
    assert float(jnp.max(jnp.abs(a - aref))) < 1e-10


def test_leaf_inv_sharing_and_alpha_fold():
    """One diag_block_invs feeds every solve against the factor, and the
    alpha-folded pipeline (y concatenated into the wide forward solve,
    finished by tri_solve_blocked_t) equals the separate cho_solve."""
    n, nb, t = 512, 128, 40
    L = _spd(n, seed=2)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal((n, 1)))
    Bs = jnp.asarray(rng.standard_normal((n, t)))

    Dinv = diag_block_invs(L, nb)
    assert Dinv.shape == (n // nb, nb, nb)
    # leaf inverses really are the diagonal-block inverses
    blk = L[:nb, :nb]
    assert float(jnp.max(jnp.abs(Dinv[0] @ blk - jnp.eye(nb)))) < 1e-10

    Z = tri_solve_blocked(L, jnp.concatenate([y, Bs], axis=1), nb=nb,
                          leaf_inv=Dinv)
    alpha = tri_solve_blocked_t(L, Z[:, :1], nb=nb, leaf_inv=Dinv)
    alpha_ref = cho_solve_blocked(L, y, nb=nb)
    V_ref = tri_solve_blocked(L, Bs, nb=nb)
    assert float(jnp.max(jnp.abs(alpha - alpha_ref))) < 1e-10
    assert float(jnp.max(jnp.abs(Z[:, 1:] - V_ref))) < 1e-10


def _qform_setup(n=256, t=96, s=0.35, seed=4):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 2))
    xt = rng.uniform(-1, 1, (t, 2))
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-sq / 0.5)
    sqs = ((x[:, None, :] - xt[None, :, :]) ** 2).sum(-1)
    B = np.exp(-sqs / 0.5)                        # (n, t)
    A = K + s * s * np.eye(n)
    q_true = np.einsum("nt,nt->t", B, np.linalg.solve(A, B))
    return K, B, A, q_true


def test_qform_refined_second_order():
    """q~ = 2b'w0 - w0'Aw0 under-shoots b'A^-1 b by exactly r'A^-1 r —
    quadratic in the solve residual and on the conservative (variance
    over-estimating) side."""
    from stpy_tpu.ops.pallas_qform_df import qform_refined

    K, B, A, q_true = _qform_setup()
    s = jnp.asarray(0.35)
    W_exact = np.linalg.solve(A, B)
    rng = np.random.default_rng(5)
    for noise in (1e-3, 1e-5):
        W0 = W_exact + noise * rng.standard_normal(W_exact.shape)
        qh, ql = qform_refined(
            jnp.asarray(K), jnp.zeros_like(jnp.asarray(K)), jnp.asarray(W0),
            jnp.asarray(B), jnp.zeros_like(jnp.asarray(B)), s,
        )
        q = np.asarray(qh, np.float64) + np.asarray(ql, np.float64)
        err = q_true - q
        # undershoot: r'A^-1 r >= 0 up to df roundoff
        assert err.min() > -1e-9
        # second order: bounded by ||r||^2 / lambda_min with r ~ A @ dW
        r = B - A @ W0
        bound = (r * r).sum(0) / (0.35**2) + 1e-9
        assert np.all(err <= bound * 1.01)
        if noise == 1e-5:
            assert np.max(np.abs(err) / q_true) < 1e-6


def test_qform_pallas_kernel_matches_f64():
    """The Pallas kernel (interpret mode) reproduces the f64 evaluation of
    the same estimate to double-float accuracy — the EFT accumulation,
    s^2 diagonal k-step, and sublane folding are all exercised."""
    from stpy_tpu.ops import pallas_qform_df as mod

    K, B, A, q_true = _qform_setup(n=256, t=128)
    s = jnp.asarray(0.35)
    rng = np.random.default_rng(6)
    W0 = np.linalg.solve(A, B) + 1e-4 * rng.standard_normal(B.shape)

    Kf = jnp.asarray(K, jnp.float32)
    Bf = jnp.asarray(B, jnp.float32)
    Wf = jnp.asarray(W0, jnp.float32)
    zK, zB = jnp.zeros_like(Kf), jnp.zeros_like(Bf)

    qh_i, ql_i = mod.qform_refined(Kf, zK, Wf, Bf, zB, s, block_m=128,
                                   block_n=128, block_k=128, interpret=True)
    fh, fl = mod._qform_f64(Kf, zK, Wf, Wf, Bf, zB, s ** 2)
    got = np.asarray(qh_i, np.float64) + np.asarray(ql_i, np.float64)
    want = np.asarray(fh, np.float64) + np.asarray(fl, np.float64)
    # the kernel's floor is the WITHIN-TILE rounding of the HIGHEST
    # (f32-faithful) main product — ~1e-7 relative; the df machinery
    # removes only the cross-tile accumulator error. Same floor as the
    # measured on-device variance accuracy (2-4e-6 at n=4k..16k).
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-3)) < 2e-6
    # and the estimate itself recovers the true quadratic form
    assert np.max(np.abs(got - q_true) / q_true) < 2e-5


def test_qform_bf16x3_high_grade():
    """qform_precision='bf16x3' (emulated HIGH main product: explicit bf16
    splits, 3 DEFAULT MXU passes) must stay HIGH-grade correct. It was
    REJECTED as the default on accuracy (TPU batch Y: variance max
    8.7e-5–2.3e-4 vs HIGHEST's 2.3e-6–7.5e-6 at n=16k — the dropped a1·b1
    term's ~2⁻¹⁷ first-order noise overwhelms the second-order refinement
    identity), and stays an opt-in for MAP-grade posteriors at ~3x the
    HIGHEST MXU rate."""
    from stpy_tpu.ops import pallas_qform_df as mod

    K, B, A, q_true = _qform_setup(n=256, t=128)
    s = jnp.asarray(0.35)
    rng = np.random.default_rng(6)
    W0 = np.linalg.solve(A, B) + 1e-4 * rng.standard_normal(B.shape)

    Kf = jnp.asarray(K, jnp.float32)
    Bf = jnp.asarray(B, jnp.float32)
    Wf = jnp.asarray(W0, jnp.float32)
    zK, zB = jnp.zeros_like(Kf), jnp.zeros_like(Bf)

    qh, ql = mod.qform_refined(Kf, zK, Wf, Bf, zB, s, block_m=128,
                               block_n=128, block_k=128, interpret=True,
                               main_precision="bf16x3")
    got = np.asarray(qh, np.float64) + np.asarray(ql, np.float64)
    rel = np.max(np.abs(got - q_true) / q_true)
    assert rel < 5e-4            # HIGH-grade, not df-grade
    assert np.isfinite(got).all()


def test_gemv_df_fused_matches_f64():
    """The fused Pallas df GEMV (interpret mode) matches the f64 GEMV of
    the full (hi + lo) matrix — covering the lane-tree reduction, the
    cross-k-tile EFT accumulator, and the caller-side 128-lane fold, with
    non-aligned shapes forcing the zero-padding path.

    Bound: 5e-7 relative, NOT df-exact — XLA:CPU contracts the kernel's
    TwoProd multiplies into the consuming adds when the products are not
    materialized (verified: writing `ph` straight to an output reproduces
    the plain-HLO values bit-exactly; letting it flow into the lane tree
    shifts fl(a·v + x) by one product-rounding, ~eps·|a·v|). That is an
    interpret-mode artifact: the Mosaic TPU lowering keeps EFT intact
    (the same bare-form arithmetic in ops/pallas_gram_df measured 2.6e-9
    per entry on-device), and the on-device double-mode posterior means
    (9.7e-8 at n=16k vs host f64, benchmarks/exp_r3_batch_c.py C1) are
    the real exactness assertion. The interpret run still catches every
    structural bug (wrong block indexing, dropped accumulator or lo
    stream, bad padding): any of those costs >=1e-5 here, 20x+ the
    bound."""
    from stpy_tpu.ops.compensated import gemv_df
    from stpy_tpu.ops.pallas_gemv_df import gemv_df_fused

    rng = np.random.default_rng(7)
    m, k = 300, 700
    A64 = np.exp(-((rng.uniform(-1, 1, (m, k))) ** 2)) * 3.0
    Ah = A64.astype(np.float32)
    Al = (A64 - Ah.astype(np.float64)).astype(np.float32)
    v = rng.standard_normal(k).astype(np.float32)
    want = A64 @ v.astype(np.float64)

    oh, ol = gemv_df_fused(jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(v),
                           block_m=128, block_k=256, interpret=True)
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-7

    # agrees with the HLO tree implementation to the same bound (the HLO
    # tree itself is df-exact vs f64 — asserted in test_compensated)
    hh, hl = gemv_df(jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(v))
    hlo = np.asarray(hh, np.float64) + np.asarray(hl, np.float64)
    assert np.max(np.abs(got - hlo)) / scale < 5e-7

    # x64 CPU dispatch (no explicit interpret) returns the f64 contract
    fh, fl_ = gemv_df_fused(jnp.asarray(Ah), jnp.asarray(Al),
                            jnp.asarray(v))
    fgot = np.asarray(fh, np.float64) + np.asarray(fl_, np.float64)
    assert np.max(np.abs(fgot - want)) / scale < 1e-11

    # df v: (vh, vl) split of an f64 vector — the Ah*vl stream must land
    v64 = rng.standard_normal(k) * 1.7
    vh = v64.astype(np.float32)
    vloc = (v64 - vh.astype(np.float64)).astype(np.float32)
    want_df = A64 @ v64
    oh2, ol2 = gemv_df_fused(jnp.asarray(Ah), jnp.asarray(Al),
                             jnp.asarray(vh), vl=jnp.asarray(vloc),
                             block_m=128, block_k=256, interpret=True)
    got2 = np.asarray(oh2, np.float64) + np.asarray(ol2, np.float64)
    assert np.max(np.abs(got2 - want_df)) / np.max(np.abs(want_df)) < 5e-7
    hh2, hl2 = gemv_df(jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(vh),
                       vl=jnp.asarray(vloc))
    hlo2 = np.asarray(hh2, np.float64) + np.asarray(hl2, np.float64)
    assert np.max(np.abs(hlo2 - want_df)) / np.max(np.abs(want_df)) < 1e-11
