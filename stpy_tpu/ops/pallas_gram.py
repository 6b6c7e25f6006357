"""Fused pairwise-distance → kernel-shape Gram construction as a Pallas TPU
kernel.

This replaces the reference's torch Gram hot loop (stpy/kernels.py:368-393,
811-860): one MXU matmul per (TM, TN) tile computes the cross-products, the
VPU fuses the rank-1 norm corrections and the exp/Matérn shape in-register,
and the tile is written once to HBM — no materialized (n, m, d) differences
and no separate distance matrix round-trip through HBM.

FLOP analysis per tile: 2·TM·TN·D matmul FLOPs on the MXU + O(TM·TN)
transcendentals on the VPU; bytes ≈ (TM·D + TN·D + TM·TN)·4. For n = m = 16k,
D = 128 this is arithmetic-intensity ≈ 64 FLOP/byte on the matmul part —
HBM-bound only on the output write, which is unavoidable.

Differentiability: wrapped in `jax.custom_vjp`; the backward pass recomputes
the needed pieces with plain jnp (used only in hyperopt at modest n).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stpy_tpu.kernels import functions as F

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)

# distance eps: keeps sqrt differentiable / non-nan at coincident points
_EPS = 1e-30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shape_fn(family: str, nu: float):
    """Map squared scaled distance -> kernel value (runs on the VPU)."""
    if family == "se":
        return lambda sq: jnp.exp(-0.5 * sq)
    if family == "matern":
        if nu == 0.5:
            return lambda sq: jnp.exp(-jnp.sqrt(sq + _EPS))
        if nu == 1.5:
            def f(sq):
                k = _SQRT3 * jnp.sqrt(sq + _EPS)
                return (1.0 + k) * jnp.exp(-k)
            return f
        if nu == 2.5:
            def f(sq):
                k = _SQRT5 * jnp.sqrt(sq + _EPS)
                return (1.0 + k + k * k / 3.0) * jnp.exp(-k)
            return f
        raise NotImplementedError(f"matern nu={nu}")
    raise NotImplementedError(f"family={family}")


def _gram_kernel(kappa_ref, x_ref, y_ref, o_ref, *, shape_fn):
    xb = x_ref[:]                                   # (TM, D)
    yb = y_ref[:]                                   # (TN, D)
    prod = jax.lax.dot_general(
        xb, yb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # pinned: Mosaic lowers DEFAULT/HIGHEST only, and the Gram feeds a
        # Cholesky — keep full f32 products regardless of the global setting
        precision=jax.lax.Precision.HIGHEST,
    )                                               # (TM, TN) on the MXU
    nx = jnp.sum(xb * xb, axis=1, keepdims=True)    # (TM, 1)
    ny = jnp.sum(yb * yb, axis=1, keepdims=True).T  # (1, TN)
    sq = jnp.maximum(nx + ny - 2.0 * prod, 0.0)
    o_ref[:] = (kappa_ref[0, 0] * shape_fn(sq)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("family", "nu", "block_m", "block_n", "interpret")
)
def _gram_pallas(
    xs, ys, kappa,
    *, family: str, nu: float, block_m: int, block_n: int, interpret: bool,
):
    n, d = xs.shape
    m = ys.shape[0]
    dp = _round_up(max(d, 1), 128)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)
    xs = jnp.pad(xs, ((0, np_ - n), (0, dp - d))).astype(jnp.float32)
    ys = jnp.pad(ys, ((0, mp - m), (0, dp - d))).astype(jnp.float32)

    shape_fn = _shape_fn(family, nu)
    kern = functools.partial(_gram_kernel, shape_fn=shape_fn)
    kappa_arr = jnp.asarray(kappa, dtype=jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        kern,
        grid=(np_ // block_m, mp // block_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * dp + 8 * np_ * mp,
            bytes_accessed=4 * (np_ * dp + mp * dp + np_ * mp),
            transcendentals=np_ * mp,
        ),
        interpret=interpret,
    )(kappa_arr, xs, ys)
    return out[:n, :m]


def _gram_jnp(xs, ys, kappa, family, nu):
    sq = F.sq_dist(xs, ys)
    return kappa * _shape_fn(family, nu)(sq)


def _use_pallas(n, m):
    return jax.default_backend() == "tpu"


# --- differentiable entry points ------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gram(xs, ys, gamma, kappa, family, nu):
    """Gram of pre-grouped inputs with scalar (or per-dim) lengthscale."""
    xs_, ys_ = xs / gamma, ys / gamma
    n, m = xs.shape[0], ys.shape[0]
    if _use_pallas(n, m):
        return _gram_pallas(
            xs_, ys_, kappa, family=family, nu=float(nu),
            block_m=256, block_n=256, interpret=False,
        ).astype(xs.dtype)
    return _gram_jnp(xs_, ys_, kappa, family, nu)


def _gram_fwd(xs, ys, gamma, kappa, family, nu):
    out = _gram(xs, ys, gamma, kappa, family, nu)
    return out, (xs, ys, gamma, kappa)


def _gram_bwd(family, nu, res, g):
    """Backward via the closed-form dK/dsq; plain jnp (hyperopt-scale n)."""
    xs, ys, gamma, kappa = res
    xs_, ys_ = xs / gamma, ys / gamma
    sq = F.sq_dist(xs_, ys_)
    if family == "se":
        K = jnp.exp(-0.5 * sq)
        dK_dsq = -0.5 * K
    elif family == "matern":
        r = jnp.sqrt(sq + _EPS)
        if nu == 0.5:
            K = jnp.exp(-r)
            dK_dsq = -K / (2.0 * r)
        elif nu == 1.5:
            k = _SQRT3 * r
            K = (1.0 + k) * jnp.exp(-k)
            dK_dsq = -1.5 * jnp.exp(-k)  # dK/dsq = -(3/2) e^{-sqrt3 r}
        elif nu == 2.5:
            k = _SQRT5 * r
            K = (1.0 + k + k * k / 3.0) * jnp.exp(-k)
            dK_dsq = -(5.0 / 6.0) * (1.0 + k) * jnp.exp(-k)
        else:
            raise NotImplementedError
    else:
        raise NotImplementedError
    gk = g * kappa
    W = gk * dK_dsq                                     # (n, m)
    # d sq / d xs_ = 2 (xs_i - ys_j); chain through the 1/gamma scaling
    row = jnp.sum(W, axis=1, keepdims=True)
    col = jnp.sum(W, axis=0, keepdims=True)
    d_xs = (2.0 * (row * xs_ - W @ ys_)) / gamma
    d_ys = (2.0 * (col.T * ys_ - W.T @ xs_)) / gamma
    # gamma: sq depends on gamma via xs_/ys_; d sq/d gamma = -2 sq / gamma
    if jnp.ndim(gamma) == 0:
        d_gamma = jnp.sum(W * (-2.0 * sq)) / gamma
    else:  # per-dim lengthscale (ARD)
        diff2 = (xs_[:, None, :] - ys_[None, :, :]) ** 2
        d_gamma = jnp.einsum("nm,nmd->d", W, -2.0 * diff2) / gamma
    d_kappa = jnp.sum(g * K)
    return d_xs, d_ys, d_gamma, d_kappa


_gram.defvjp(_gram_fwd, _gram_bwd)


# --- Laplace (L1/Manhattan) family ------------------------------------------
#
# No matmul identity exists for L1 distances, so this kernel is VPU-bound:
# per (TM, TN) tile it accumulates |x[:,c] - y[c,:]| over a STATICALLY
# UNROLLED feature loop (static lane/sublane slices lower cleanly in Mosaic;
# y arrives pre-transposed so the broadcast is (TM,1)-(1,TN) with no
# in-kernel relayout). The win vs the jnp path is memory, not FLOPs: no
# materialized (n, m, d) difference tensor round-tripping HBM — the tile
# accumulator lives in VMEM registers. Replaces the reference's sklearn
# manhattan_distances call (stpy/kernels.py:347-366).

_L1_MAX_UNROLL = 128


def _gram_l1_kernel(kappa_ref, invg_ref, x_ref, yT_ref, o_ref, *, d):
    xb = x_ref[:]                                   # (TM, dp)
    yb = yT_ref[:]                                  # (dp, TN)
    acc = jnp.zeros((xb.shape[0], yb.shape[1]), jnp.float32)
    for c in range(d):                              # static unroll
        acc = acc + jnp.abs(xb[:, c:c + 1] - yb[c:c + 1, :])
    o_ref[:] = (kappa_ref[0, 0]
                * jnp.exp(-acc * invg_ref[0, 0])).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def _gram_l1_pallas(xs, ys, inv_g2, kappa,
                    *, block_m: int, block_n: int, interpret: bool):
    n, d = xs.shape
    m = ys.shape[0]
    dp = _round_up(max(d, 1), 8)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)
    xs = jnp.pad(xs, ((0, np_ - n), (0, _round_up(d, 128) - d)))
    ysT = jnp.pad(ys, ((0, mp - m), (0, dp - d))).T  # (dp, mp)
    xs = xs.astype(jnp.float32)
    ysT = ysT.astype(jnp.float32)

    kern = functools.partial(_gram_l1_kernel, d=d)
    out = pl.pallas_call(
        kern,
        grid=(np_ // block_m, mp // block_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, xs.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * np_ * mp * d,
            bytes_accessed=4 * (np_ * d + mp * d + np_ * mp),
            transcendentals=np_ * mp,
        ),
        interpret=interpret,
    )(jnp.asarray(kappa, jnp.float32).reshape(1, 1),
      jnp.asarray(inv_g2, jnp.float32).reshape(1, 1),
      xs, ysT)
    return out[:n, :m]


@jax.custom_vjp
def _gram_l1(xs, ys, gamma, kappa):
    """kappa * exp(-||x - y||_1 / gamma^2)."""
    inv_g2 = 1.0 / (gamma * gamma)
    if _use_pallas(xs.shape[0], ys.shape[0]) and xs.shape[1] <= _L1_MAX_UNROLL:
        return _gram_l1_pallas(
            xs, ys, inv_g2, kappa, block_m=256, block_n=256, interpret=False,
        ).astype(xs.dtype)
    D = F.manhattan_dist(xs, ys)
    return kappa * jnp.exp(-D * inv_g2)


def _gram_l1_fwd(xs, ys, gamma, kappa):
    return _gram_l1(xs, ys, gamma, kappa), (xs, ys, gamma, kappa)


def _gram_l1_bwd(res, g):
    """Closed-form backward; plain jnp (hyperopt-scale n)."""
    xs, ys, gamma, kappa = res
    D = F.manhattan_dist(xs, ys)
    inv_g2 = 1.0 / (gamma * gamma)
    K = jnp.exp(-D * inv_g2)
    W = g * kappa * K * inv_g2                       # = -g dK/dD (n, m)
    sgn = jnp.sign(xs[:, None, :] - ys[None, :, :])  # (n, m, d)
    d_xs = -jnp.einsum("nm,nmd->nd", W, sgn)
    d_ys = jnp.einsum("nm,nmd->md", W, sgn)
    d_gamma = jnp.sum(W * D) * (2.0 / gamma)
    d_kappa = jnp.sum(g * K)
    return d_xs, d_ys, d_gamma, d_kappa


_gram_l1.defvjp(_gram_l1_fwd, _gram_l1_bwd)


def gram_laplace(x, y, gamma, kappa=1.0):
    """Fused Laplace Gram: kappa * exp(-manhattan(x, y)/gamma^2)."""
    return _gram_l1(x, y, gamma, kappa)


# --- public API -------------------------------------------------------------

def gram_se(x, y, gamma, kappa=1.0):
    """Fused SE Gram: kappa * exp(-||x-y||^2/(2 gamma^2)); gamma scalar or
    per-dim (ARD)."""
    return _gram(x, y, gamma, kappa, "se", 1.0)


def gram_matern(x, y, gamma, kappa=1.0, nu=1.5):
    """Fused Matérn Gram for nu in {0.5, 1.5, 2.5}."""
    return _gram(x, y, gamma, kappa, "matern", nu)


def gram(x, y, *, family="se", gamma=1.0, kappa=1.0, nu=1.5):
    if family == "se" or family == "ard":
        return gram_se(x, y, gamma, kappa)
    if family == "matern":
        return gram_matern(x, y, gamma, kappa, nu)
    if family == "laplace":
        return gram_laplace(x, y, gamma, kappa)
    raise NotImplementedError(family)
