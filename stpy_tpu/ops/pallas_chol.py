"""In-VMEM Pallas Cholesky for (≤1024)² leaf blocks.

XLA's TPU Cholesky is latency-bound at leaf sizes: chol(2048) measures
~3.4 ms net for ~0.1 ms of FLOPs (sequential inner loops through HBM-level
orchestration), and the 8–16 leaf factorizations dominate the blocked
right-looking factorization's critical path (benchmarks/exp_chol3.py).
This kernel keeps the whole leaf resident in VMEM and factorizes it with
128-column panels:

  per panel p:  D = A[s:s+bp, s:s+bp]
    1. masked 128-step factorization of D (fori_loop; column k selected by
       an iota one-hot, rank-1 VPU update — no dynamic slicing)
    2. masked forward substitution building D⁻¹ = Ld⁻¹ (same pattern)
    3. panel below: Lp = B @ Ld⁻ᵀ          (MXU, f32 HIGHEST)
    4. trailing:    A22 ← A22 − Lp Lpᵀ      (MXU, f32 HIGHEST)

Indefinite inputs produce NaN through sqrt(negative) exactly like
jnp.linalg.cholesky, so safe_cholesky's jitter ladder composes. The
(nb, nb) leaf never leaves VMEM: one kernel dispatch replaces XLA's
entire factorization schedule. Upper triangle of the output is zero.

No reference counterpart (torch f64 CPU potrf, gauss_procc.py:370).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _masked_chol_128(D, bp):
    """Masked unblocked factorization of a (bp, bp) tile: returns lower Ld
    with Ld Ldᵀ = D. No dynamic indexing — column k is extracted with an
    iota one-hot so every step is full-tile VPU work."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)

    def step(k, carry):
        D, Ld = carry
        onek = (iota == k).astype(D.dtype)              # (bp, 1)
        col = jax.lax.dot(D, onek, precision=_HI)       # D[:, k]
        d = jnp.sum(col * onek)                         # D[k, k]
        inv = 1.0 / jnp.sqrt(d)                         # NaN if d < 0
        lcol = col * jnp.where(iota >= k, inv, 0.0)     # scaled, zero above
        D = D - jax.lax.dot(lcol, lcol.T, precision=_HI)
        Ld = Ld + jax.lax.dot(lcol, onek.T, precision=_HI)
        return D, Ld

    _, Ld = jax.lax.fori_loop(0, bp, step, (D, jnp.zeros_like(D)))
    return Ld


def _masked_tri_inv_128(Ld, bp):
    """Masked forward substitution: X = Ld⁻¹ for lower-triangular Ld."""
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)

    def step(k, X):
        onek = (iota_r == k).astype(Ld.dtype)            # (bp, 1)
        lrow = jax.lax.dot(onek.T, Ld, precision=_HI)    # (1, bp) row k
        d = jnp.sum(lrow * onek.T)                       # Ld[k, k]
        below = lrow * jnp.where(iota_r.T < k, 1.0, 0.0)  # strictly-left part
        acc = jax.lax.dot(below, X, precision=_HI)       # Σ_{j<k} L[k,j] X[j,:]
        newrow = (onek.T - acc) / d
        return X + jax.lax.dot(onek, newrow, precision=_HI)

    return jax.lax.fori_loop(0, bp, step, jnp.zeros_like(Ld))


def _chol_leaf_kernel(a_ref, o_ref, *, n, bp):
    A = a_ref[:]
    cols = []
    for p in range(n // bp):
        D = A[:bp, :bp]
        Ld = _masked_chol_128(D, bp)
        m = n - (p + 1) * bp
        if m > 0:
            Ldinv = _masked_tri_inv_128(Ld, bp)
            B = A[bp:, :bp]
            Lp = jax.lax.dot(B, Ldinv.T, precision=_HI)   # (m, bp)
            A = A[bp:, bp:] - jax.lax.dot(Lp, Lp.T, precision=_HI)
            col = jnp.concatenate([Ld, Lp], axis=0)
        else:
            col = Ld
        cols.append(jnp.pad(col, ((p * bp, 0), (0, 0))))
    o_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("bp", "interpret"))
def chol_leaf(A, *, bp: int = 128, interpret: bool = False):
    """Lower Cholesky of an SPD block, entirely inside one Pallas kernel.
    Sizes up to 1024 (VMEM: in + out + working copy ≈ 12 MB at 1024)."""
    n = A.shape[0]
    pad = (-n) % bp
    if pad:
        Ap = jnp.zeros((n + pad, n + pad), A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        return chol_leaf(Ap, bp=bp, interpret=interpret)[:n, :n]
    out = pl.pallas_call(
        functools.partial(_chol_leaf_kernel, n=n, bp=bp),
        grid=(1,),
        in_specs=[pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        interpret=interpret,
    )(A.astype(jnp.float32))
    return out
