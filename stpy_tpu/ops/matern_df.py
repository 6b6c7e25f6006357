"""Dedicated double-float Gram for the general-ν Matérn family.

Since r5 the general-ν Matérn (Bessel K_ν by fixed trapezoid quadrature,
kernels/functions.py:bessel_kv) is df-expressible through the generic
jaxpr interpreter (ops/df_interp.py) — but the interpreter evaluates the
atom's BROADCAST trace, whose (rows, n_b, n_quad) Bessel exponent keeps
~20 barrier-guarded EFT intermediates live at once and forces the
adaptive row chunk down to ~40 rows (kernels/df_plan.py:
_row_chunk_for_trace).  This module is the ROADMAP's "dedicated df
Bessel" fix: the same integral evaluated by SCANNING the nodes with
compensated (hi, lo) accumulation, so the live set per row chunk is a
handful of (rows, n_b) pairs and the chunk goes back to 2048 rows
(~10x fewer map steps, no giant fusions).

The node count is tuned to the df error budget, not the f64 one: the
f32 atom (bessel_kv) keeps T = 24 / 384 nodes (< 1e-13 relative in f64
for ν ∈ [0.3, 3.3]); this tier defaults to T = 20 / 128 nodes, measured
≤ 2.4e-13 max relative vs scipy.special.kv over ν ∈ {0.3, 0.7, 1.2,
2.7, 3.3} × x ∈ [1e-6, 31.6] (400-point logspace sweep) — two orders
below the ~1e-9 df arithmetic floor, at 3x fewer node scans.  (96
nodes / T = 18 degrades to ~7e-9 — too close to the floor.)  The arg
clamp at 1e-6 guarantees the integrand is fully decayed by t = T:
x·cosh(20) ≥ 242 for every evaluated x.

Semantics match kernels/functions.py:matern in f64:
    k = κ · clip(c_ν · arg^ν · K_ν(arg), 0, 1),  arg = √(2ν)·‖x−y‖/γ
with c_ν = 2^{1−ν}/Γ(ν), arg clamped at 1e-6 and the r → 0 limit pinned
to exactly 1 — the same branch structure as the f32 atom.  All EFT steps
are barrier-guarded HLO (ops/pallas_gram_df._make_eft(True)); node
constants (cosh tᵢ, logcosh(ν tᵢ) + log wᵢ) are split on HOST in f64.
Accuracy: ≤ ~1e-9 relative vs the f64 quadrature (df op floor), i.e. the
scipy.special.kv reference of stpy/kernels.py:852-858 within quadrature
truncation.  Inference-path only (no reverse-mode; hyperopt gradients
stay on the f32/f64 atom).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.ops.df_interp import (
    df_add,
    df_exp,
    df_log,
    df_mul,
    df_sqrt,
)
from stpy_tpu.ops.pallas_gram_df import (
    _df_inv,
    _df_inv_pair,
    _df_scale_coords,
    _make_eft,
)

_two_sum, _fast_two_sum, _two_prod, _df_add4 = _make_eft(True)


def _split64(v):
    """Host f64 → (hi, lo) f32 pair (exact split, numpy only)."""
    a = np.asarray(v, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _const_pair(v, like):
    hi, lo = _split64(v)
    return (jnp.full_like(like, float(hi)), jnp.full_like(like, float(lo)))


def _node_constants(nu: float, T: float, n_quad: int):
    """Quadrature node constants, split on host in f64: (n_quad, 2)
    arrays of cosh tᵢ and logcosh(ν tᵢ) + log wᵢ (trapezoid weights with
    endpoint halving folded into the exponent)."""
    t = np.linspace(0.0, T, n_quad)
    w = np.full(n_quad, T / (n_quad - 1))
    w[0] *= 0.5
    w[-1] *= 0.5
    z = np.abs(nu * t)
    logcosh = z + np.log1p(np.exp(-2.0 * z)) - math.log(2.0)
    ch, cl = _split64(np.cosh(t))
    lh, ll = _split64(logcosh + np.log(w))
    return (jnp.asarray(np.stack([ch, cl], 1)),
            jnp.asarray(np.stack([lh, ll], 1)))


def _df_sq_dist(xh, xl, yh, yl):
    """df pairwise squared distances of pre-scaled coords — the
    _gram_df_hlo dim_body recurrence, (cb, m) pairs only."""
    d = xh.shape[1]
    m = yh.shape[0]
    acc_h = jnp.zeros((xh.shape[0], m), jnp.float32)
    acc_l = jnp.zeros_like(acc_h)

    def dim_body(c, carry):
        ah, al = carry
        dh, de = _two_sum(
            jax.lax.dynamic_slice_in_dim(xh, c, 1, 1),
            -jax.lax.dynamic_slice_in_dim(yh, c, 1, 1).T,
        )
        dl = de + (jax.lax.dynamic_slice_in_dim(xl, c, 1, 1)
                   - jax.lax.dynamic_slice_in_dim(yl, c, 1, 1).T)
        sh, se = _two_prod(dh, dh)
        se = se + 2.0 * dh * dl
        return _df_add4(ah, al, sh, se)

    return jax.lax.fori_loop(0, d, dim_body, (acc_h, acc_l))


def _where_pair(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def gram_matern_gen_df(x, y, gamma, kappa=1.0, *, nu,
                       gamma_lo=None, kappa_lo=None,
                       T=20.0, n_quad=128, row_chunk=None,
                       budget_elems=48 * 1024 * 1024):
    """(hi, lo) f32 Gram of the general-ν Matérn kernel, node-scanned.

    gamma may be scalar or per-dim (ARD); gamma_lo/kappa_lo restore the
    f64 meaning of traced f32 hyperparameters (same contract as
    ops/pallas_gram_df.gram_df).  Row-chunked with ~16 live (rows, m)
    f32 temporaries budgeted to `budget_elems` elements (~3 GB at the
    default)."""
    nu = float(nu)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, d = x.shape
    m = y.shape[0]
    g = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32).reshape(-1), (d,))

    # df reciprocal of γ — host-split when concrete (keeps the f64
    # meaning), df Newton when traced with a lo limb (params_with_lo)
    if isinstance(gamma, (int, float, np.ndarray, np.floating)):
        inv64 = 1.0 / np.broadcast_to(
            np.asarray(gamma, np.float64).reshape(-1), (d,))
        ih_np, il_np = _split64(inv64)
        ih, il = jnp.asarray(ih_np), jnp.asarray(il_np)
    elif gamma_lo is not None:
        gl = jnp.broadcast_to(
            jnp.asarray(gamma_lo, jnp.float32).reshape(-1), (d,))
        ih, il = _df_inv_pair(g, gl)
    else:
        ih, il = _df_inv(g)
    xh, xl = _df_scale_coords(x.astype(jnp.float32), ih, il)
    yh, yl = _df_scale_coords(y.astype(jnp.float32), ih, il)
    if x.dtype == jnp.float64:
        # x64 inputs (CPU tests): fold the coords' own split residue in,
        # keeping the f64 meaning like df_call's input splitting
        x32 = x.astype(jnp.float32)
        y32 = y.astype(jnp.float32)
        rxh, rxl = _df_scale_coords(
            (x - x32.astype(jnp.float64)).astype(jnp.float32), ih, il)
        ryh, ryl = _df_scale_coords(
            (y - y32.astype(jnp.float64)).astype(jnp.float32), ih, il)
        xh, xl = _fast_two_sum(xh, xl + (rxh + rxl))
        yh, yl = _fast_two_sum(yh, yl + (ryh + ryl))

    if isinstance(kappa, (int, float, np.ndarray, np.floating)):
        kh_np, kl_np = _split64(np.float64(kappa))
        kap = (jnp.asarray(kh_np).reshape(()), jnp.asarray(kl_np).reshape(()))
    else:
        klo = (jnp.asarray(kappa_lo, jnp.float32).reshape(())
               if kappa_lo is not None else jnp.zeros((), jnp.float32))
        kap = (jnp.asarray(kappa, jnp.float32).reshape(()), klo)

    Cq, Lq = _node_constants(nu, T, n_quad)
    sqrt2nu = math.sqrt(2.0 * nu)
    cnu = 2.0 ** (1.0 - nu) / math.gamma(nu)

    if row_chunk is None:
        row_chunk = int(max(8, min(2048, budget_elems // max(m, 1))))
        row_chunk = max(8, (row_chunk // 8) * 8)
    cb = min(row_chunk, n)
    nb = -(-n // cb)
    pad = nb * cb - n
    xhb = jnp.pad(xh, ((0, pad), (0, 0))).reshape(nb, cb, d)
    xlb = jnp.pad(xl, ((0, pad), (0, 0))).reshape(nb, cb, d)

    def body(args):
        xhc, xlc = args
        sq = _df_sq_dist(xhc, xlc, yh, yl)
        dist = df_sqrt(sq)
        targ = df_mul(dist, _const_pair(sqrt2nu, dist[0]))
        small = targ[0] < 1e-6
        arg = _where_pair(small, (jnp.full_like(targ[0], 1e-6),
                                  jnp.zeros_like(targ[0])), targ)

        def node(i, acc):
            c = (-Cq[i, 0], -Cq[i, 1])
            lw = (Lq[i, 0], Lq[i, 1])
            p, pe = _two_prod(arg[0], c[0])
            eh, el = _fast_two_sum(p, pe + (arg[0] * c[1] + arg[1] * c[0]))
            sh_, se_ = _two_sum(eh, lw[0])
            expo = _fast_two_sum(sh_, se_ + (el + lw[1]))
            return df_add(acc, df_exp(expo))

        acc0 = (jnp.zeros_like(arg[0]), jnp.zeros_like(arg[0]))
        Kq = jax.lax.fori_loop(0, n_quad, node, acc0)
        # c_ν · arg^ν · K_ν: arg^ν = exp(ν·log arg) in df
        pw = df_exp(df_mul(df_log(arg), _const_pair(nu, arg[0])))
        val = df_mul(df_mul(_const_pair(cnu, arg[0]), pw), Kq)
        # clip to [0, 1] on the hi limb, exact limit 1 at r → 0
        one = (jnp.ones_like(val[0]), jnp.zeros_like(val[0]))
        zero = (jnp.zeros_like(val[0]), jnp.zeros_like(val[0]))
        val = _where_pair(val[0] + val[1] > 1.0, one, val)
        val = _where_pair(val[0] < 0.0, zero, val)
        val = _where_pair(small, one, val)
        kb = (jnp.broadcast_to(kap[0], val[0].shape),
              jnp.broadcast_to(kap[1], val[0].shape))
        return df_mul(kb, val)

    oh, ol = jax.lax.map(body, (xhb, xlb))
    return (oh.reshape(-1, m)[:n].astype(jnp.float32),
            ol.reshape(-1, m)[:n].astype(jnp.float32))
