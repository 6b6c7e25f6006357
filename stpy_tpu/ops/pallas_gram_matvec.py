"""Lazy (matrix-free) Gram matvec as a Pallas TPU kernel:

    out_i = Σ_j k(x_i, y_j) · v_j      without ever materializing K.

Per (TM, TN) grid tile: one MXU `dot_general` for the cross products, the
kernel shape fused on the VPU, then a row-reduction against the v tile —
the Gram tile lives only in registers/VMEM. Memory is O(n + m) instead of
O(n·m), so CG / Lanczos inference scales to n far beyond HBM capacity
(n = 10⁶ needs 8 TB for a dense K; this needs 32 MB). Compute per matvec is
O(n·m·d_padded) — measured ~40 ms at n = 65k on a v5e (the HIGHEST-precision
MXU pass runs ~27 effective TFLOP/s; inputs are lane-padded to d = 128).

The output block is revisited across the j (column) grid dimension and
accumulated in place — the standard Pallas reduction idiom (init on j == 0).

This is new capability, not parity: the reference materializes every Gram
(stpy/kernels.py:136-159) and is capped by CPU RAM well below n = 10⁵.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stpy_tpu.kernels import functions as F
from stpy_tpu.ops.pallas_gram import _round_up, _shape_fn, _use_pallas


def _dshape_fn(family: str, nu: float):
    """sq ↦ k'(sq)·sq  (derivative of the kernel shape w.r.t. the squared
    scaled distance, times sq). With inputs scaled as x̃ = x/γ, the
    lengthscale derivative is  ∂K/∂γ = (−2/γ)·k'(sq)·sq, so a matvec with
    this shape function gives (∂K/∂γ)v up to the (−2/γ) scalar — the
    building block for matrix-free evidence gradients."""
    _e = 1e-30
    if family == "se":
        return lambda sq: -0.5 * sq * jnp.exp(-0.5 * sq)
    if family == "matern":
        if nu == 0.5:
            def f(sq):
                r = jnp.sqrt(sq + _e)
                return -0.5 * r * jnp.exp(-r)
            return f
        if nu == 1.5:
            return lambda sq: -1.5 * sq * jnp.exp(
                -math.sqrt(3.0) * jnp.sqrt(sq + _e)
            )
        if nu == 2.5:
            def f(sq):
                k = math.sqrt(5.0) * jnp.sqrt(sq + _e)
                return -(5.0 / 6.0) * (1.0 + k) * jnp.exp(-k) * sq
            return f
    raise NotImplementedError((family, nu))


def _pshape_fn(family: str, nu: float):
    """sq ↦ k'(sq)  (plain derivative of the kernel shape w.r.t. the squared
    scaled distance). Used by the custom VJP's x/y cotangents."""
    _e = 1e-30
    if family == "se":
        return lambda sq: -0.5 * jnp.exp(-0.5 * sq)
    if family == "matern":
        if nu == 0.5:
            def f(sq):
                r = jnp.sqrt(sq + _e)
                return -0.5 * jnp.exp(-r) / jnp.maximum(r, 1e-6)
            return f
        if nu == 1.5:
            return lambda sq: -1.5 * jnp.exp(
                -math.sqrt(3.0) * jnp.sqrt(sq + _e)
            )
        if nu == 2.5:
            def f(sq):
                k = math.sqrt(5.0) * jnp.sqrt(sq + _e)
                return -(5.0 / 6.0) * (1.0 + k) * jnp.exp(-k)
            return f
    raise NotImplementedError((family, nu))


def _gram_matvec_kernel(kappa_ref, x_ref, y_ref, v_ref, o_ref, *, shape_fn,
                        n_j):
    j = pl.program_id(1)
    xb = x_ref[:]                                   # (TM, D)
    yb = y_ref[:]                                   # (TN, D)
    prod = jax.lax.dot_general(
        xb, yb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nx = jnp.sum(xb * xb, axis=1, keepdims=True)
    ny = jnp.sum(yb * yb, axis=1, keepdims=True).T
    sq = jnp.maximum(nx + ny - 2.0 * prod, 0.0)
    tile = kappa_ref[0, 0] * shape_fn(sq)           # (TM, TN), registers only
    part = jnp.sum(tile * v_ref[:], axis=1, keepdims=True)  # (TM, 1)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        o_ref[:] = o_ref[:] + part


_SHAPES = {"k": _shape_fn, "dk_sq": _dshape_fn, "dk": _pshape_fn}


@functools.partial(
    jax.jit,
    static_argnames=("family", "nu", "block_m", "block_n", "interpret",
                     "shape"),
)
def _gram_matvec_pallas(xs, ys, v, kappa, *, family, nu, block_m, block_n,
                        interpret, shape="k"):
    n, d = xs.shape
    m = ys.shape[0]
    dp = _round_up(max(d, 1), 128)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)
    xs = jnp.pad(xs, ((0, np_ - n), (0, dp - d))).astype(jnp.float32)
    ys = jnp.pad(ys, ((0, mp - m), (0, dp - d))).astype(jnp.float32)
    vp = jnp.pad(v.reshape(-1), (0, mp - m)).astype(jnp.float32)
    # padded y rows give garbage kernel values; zero v entries kill them
    vp2 = vp.reshape(1, mp)

    sf = _SHAPES[shape](family, nu)
    kern = functools.partial(
        _gram_matvec_kernel, shape_fn=sf, n_j=mp // block_n,
    )
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
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * dp + 10 * np_ * mp,
            bytes_accessed=4 * (np_ * dp + mp * dp + mp + np_),
            transcendentals=np_ * mp,
        ),
        interpret=interpret,
    )(jnp.asarray(kappa, jnp.float32).reshape(1, 1), xs, ys, vp2)
    return out[:n, 0]


def _gram_matmat_kernel(kappa_ref, x_ref, y_ref, v_ref, o_ref, *, shape_fn,
                        n_j):
    j = pl.program_id(1)
    xb = x_ref[:]                                   # (TM, D)
    yb = y_ref[:]                                   # (TN, D)
    prod = jax.lax.dot_general(
        xb, yb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nx = jnp.sum(xb * xb, axis=1, keepdims=True)
    ny = jnp.sum(yb * yb, axis=1, keepdims=True).T
    sq = jnp.maximum(nx + ny - 2.0 * prod, 0.0)
    tile = kappa_ref[0, 0] * shape_fn(sq)           # (TM, TN)
    # second MXU pass: contract the Gram tile against the RHS block
    part = jax.lax.dot(tile, v_ref[:],
                       precision=jax.lax.Precision.HIGHEST)   # (TM, R)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        o_ref[:] = o_ref[:] + part


@functools.partial(
    jax.jit,
    static_argnames=("family", "nu", "block_m", "block_n", "interpret",
                     "shape"),
)
def _gram_matmat_pallas(xs, ys, V, kappa, *, family, nu, block_m, block_n,
                        interpret, shape="k"):
    """Multi-RHS lazy product: K(xs, ys) @ V for V (m, r) — the tile
    contraction is a second MXU dot instead of a VPU reduction, so r up to
    ~128 RHS cost barely more than one."""
    n, d = xs.shape
    m, r = ys.shape[0], V.shape[1]
    dp = _round_up(max(d, 1), 128)
    rp = _round_up(r, 128)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)
    xs = jnp.pad(xs, ((0, np_ - n), (0, dp - d))).astype(jnp.float32)
    ys = jnp.pad(ys, ((0, mp - m), (0, dp - d))).astype(jnp.float32)
    Vp = jnp.pad(V, ((0, mp - m), (0, rp - r))).astype(jnp.float32)

    sf = _SHAPES[shape](family, nu)
    kern = functools.partial(
        _gram_matmat_kernel, shape_fn=sf, n_j=mp // block_n,
    )
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
            pl.BlockSpec((block_n, rp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, rp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, rp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * (dp + rp) + 10 * np_ * mp,
            bytes_accessed=4 * (np_ * dp + mp * dp + mp * rp + np_ * rp),
            transcendentals=np_ * mp,
        ),
        interpret=interpret,
    )(jnp.asarray(kappa, jnp.float32).reshape(1, 1), xs, ys, Vp)
    return out[:n, :r]


def gram_matmat(x, y, V, *, family="se", gamma=1.0, kappa=1.0, nu=1.5,
                block_m=512, block_n=512, shape="k"):
    """K(x, y) @ V for a BLOCK of RHS columns, without materializing K.
    Primal-only (use `gram_matvec` column-wise for autodiff); `shape`
    selects the kernel-shape function like `gram_matvec(deriv=...)`."""
    xs, ys = x / gamma, y / gamma
    if _use_pallas(x.shape[0], y.shape[0]):
        return _gram_matmat_pallas(
            xs, ys, V, kappa, family=family, nu=float(nu),
            block_m=block_m, block_n=block_n, interpret=False, shape=shape,
        ).astype(x.dtype)
    sq = F.sq_dist(xs, ys)
    return (kappa * _SHAPES[shape](family, nu)(sq)) @ V


def make_lazy_matmat(x, *, family="se", gamma=1.0, kappa=1.0, nu=1.5,
                     noise=0.0):
    """matmat(V) = (K(x, x) + noise²·I) V — block-CG / batched-probe
    companion to `make_lazy_matvec`."""
    def matmat(V):
        out = gram_matmat(x, x, V, family=family, gamma=gamma, kappa=kappa,
                          nu=nu)
        return out + (noise * noise) * V

    return matmat


def _matvec_jnp(xs, ys, v, kappa, family, nu, shape="k"):
    sq = F.sq_dist(xs, ys)
    return (kappa * _SHAPES[shape](family, nu)(sq)) @ v.reshape(-1)


def _mv_scaled(xs, ys, v, kappa, family, nu, shape="k"):
    """Matvec on PRE-SCALED inputs (x̃ = x/γ) with selectable shape fn."""
    if _use_pallas(xs.shape[0], ys.shape[0]):
        return _gram_matvec_pallas(
            xs, ys, v, kappa, family=family, nu=float(nu),
            block_m=512, block_n=512, interpret=False, shape=shape,
        ).astype(xs.dtype)
    return _matvec_jnp(xs, ys, v, kappa, family, nu, shape=shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mv_ad(x, y, v, gamma, kappa, family, nu):
    """Differentiable K(x, y) v. Backward = a handful of extra fused
    matvecs (never a dense K):
      v̄ = Kᵀḡ;  κ̄ = ḡᵀ(Kv)/κ;
      γ̄ via the k'(sq)·sq matvec (per-dim for ARD);
      x̄/ȳ via k'(sq) matvecs against coordinate-weighted vectors
      (2(d+1) passes)."""
    xs, ys = x / gamma, y / gamma
    return _mv_scaled(xs, ys, v, kappa, family, nu)


def _mv_ad_fwd(x, y, v, gamma, kappa, family, nu):
    out = _mv_ad(x, y, v, gamma, kappa, family, nu)
    return out, (x, y, v, gamma, kappa, out)


def _mv_ad_bwd(family, nu, res, gbar):
    x, y, v, gamma, kappa, out = res
    xs, ys = x / gamma, y / gamma
    v = v.reshape(-1)
    d = x.shape[1]

    def W(a, b, w, shape):  # κ·shape(sq(a,b)) @ w
        return _mv_scaled(a, b, w, kappa, family, nu, shape=shape)

    v_bar = W(ys, xs, gbar, "k")
    kappa_bar = (gbar @ out) / kappa

    # γ̄ — scalar: (−2/γ)·ḡᵀ[(κ k'·sq) v]; ARD: per-dim decomposition of sq
    if jnp.ndim(gamma) == 0:
        gamma_bar = (-2.0 / gamma) * (gbar @ W(xs, ys, v, "dk_sq"))
    else:
        Wv = W(xs, ys, v, "dk")
        parts = []
        for c in range(d):
            t1 = gbar @ (xs[:, c] ** 2 * Wv)
            t2 = gbar @ (xs[:, c] * W(xs, ys, v * ys[:, c], "dk"))
            t3 = gbar @ W(xs, ys, v * ys[:, c] ** 2, "dk")
            parts.append((-2.0 / gamma[c]) * (t1 - 2.0 * t2 + t3))
        gamma_bar = jnp.stack(parts)

    # x̄/ȳ: ∂sq/∂x̃_ic = 2(x̃_ic − ỹ_jc); chain through the 1/γ scaling
    Wv = W(xs, ys, v, "dk")
    Wg = W(ys, xs, gbar, "dk")
    x_cols, y_cols = [], []
    for c in range(d):
        x_cols.append(
            2.0 * gbar * (xs[:, c] * Wv - W(xs, ys, v * ys[:, c], "dk"))
        )
        y_cols.append(
            2.0 * v * (ys[:, c] * Wg - W(ys, xs, gbar * xs[:, c], "dk"))
        )
    x_bar = jnp.stack(x_cols, axis=1) / gamma
    y_bar = jnp.stack(y_cols, axis=1) / gamma
    return x_bar, y_bar, v_bar, gamma_bar, kappa_bar


_mv_ad.defvjp(_mv_ad_fwd, _mv_ad_bwd)


def gram_matvec(x, y, v, *, family="se", gamma=1.0, kappa=1.0, nu=1.5,
                block_m=512, block_n=512, deriv=False):
    """K(x, y) @ v without materializing K; gamma scalar or per-dim (ARD).

    Differentiable w.r.t. x, y, v, gamma, kappa — the backward pass is a
    handful of extra fused matvecs, never a dense K. `deriv=True` applies
    k'(sq)·sq instead of k(sq) (see `_dshape_fn`; primal-only)."""
    if deriv:
        return _mv_scaled(x / gamma, y / gamma, v, kappa, family, nu,
                          shape="dk_sq")
    gamma = jnp.asarray(gamma, x.dtype)
    kappa = jnp.asarray(kappa, x.dtype)
    return _mv_ad(x, y, jnp.asarray(v).reshape(-1), gamma, kappa, family,
                  float(nu))


def make_lazy_matvec_sharded(x, mesh, axis="tp", *, family="se", gamma=1.0,
                             kappa=1.0, nu=1.5, noise=0.0):
    """Multi-chip matrix-free matvec: rows of (K + σ²I)v are computed on the
    device owning those rows of x (each runs the fused Pallas kernel on its
    (n/p, n) tile lazily), with v replicated via the shard_map in_spec —
    total per-device memory stays O(n/p + n). With p chips, a 10⁶-point
    kernel matvec needs no materialized K anywhere and each chip does 1/p of
    the O(n²d) work; composes with `cg_solve` for pod-scale exact-GP
    inference."""
    import functools as _ft

    from jax.sharding import NamedSharding, PartitionSpec as P

    x_rep = jax.device_put(x, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    s2 = noise * noise

    @_ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P()), out_specs=P(axis),
        check_vma=False,
    )
    def local_rows(x_local, x_all, v):
        out = gram_matvec(
            x_local, x_all, v.reshape(-1), family=family, gamma=gamma,
            kappa=kappa, nu=nu,
        )
        # σ² v on this shard's own entries
        i = jax.lax.axis_index(axis)
        nb = x_local.shape[0]
        v_local = jax.lax.dynamic_slice(
            v.reshape(-1), (i.astype(jnp.int32) * nb,), (nb,)
        )
        return out + s2 * v_local

    def matvec(v):
        return local_rows(xs, x_rep, v)

    return matvec


def make_lazy_matvec(x, *, family="se", gamma=1.0, kappa=1.0, nu=1.5,
                     noise=0.0):
    """matvec(v) = (K(x, x) + noise²·I) v — drop into `cg_solve`/`slq` for
    K-free inference at n beyond HBM capacity."""
    def matvec(v):
        out = gram_matvec(x, x, v, family=family, gamma=gamma, kappa=kappa,
                          nu=nu)
        return out + (noise * noise) * v.reshape(-1)

    return matvec
