"""Lower-triangle-only bf16x3 symmetric rank-nb update for blocked Cholesky.

A right-looking Cholesky only ever READS the lower triangle of its trailing
matrix: the (nb, nb) diagonal leaf (factorized with symmetrize_input=False)
and the (m, nb) panel below it both live in the lower triangle. The trailing
update T ← T − W Wᵀ therefore only needs output tiles (i, j) with i ≥ j —
HALF the MXU work of the dense update XLA emits for a f32-quality
(precision=HIGH, bf16x3) GEMM, which computes all tiles of an explicitly
symmetric matrix.

Accuracy: W is pre-split into bf16 halves W = hi + lo; each lower tile
accumulates hi_i·hi_jᵀ + hi_i·lo_jᵀ + lo_i·hi_jᵀ in f32 — exactly the term
set of XLA's Precision.HIGH (the lo·lo term is dropped by both), so the
factor matches a HIGH-precision factorization to roundoff. Upper tiles are
a DMA passthrough of T (never read downstream, written only so the output
is fully defined).

Arithmetic: bf16 MACs per factorization step = 3·(m²/2)·nb vs XLA-HIGH's
3·m²·nb — the factorization's trailing updates run at ~2x the effective
f32-emulation ceiling, which no dense-GEMM formulation can reach.

No reference counterpart (stpy runs torch.cholesky on f64 CPU,
stpy/continuous_processes/gauss_procc.py:370); this kernel exists because
TPU v5e has no native f32 MXU mode — f32-quality linear algebra IS bf16
multi-pass emulation, so exploiting symmetry is the only way past the
emulation roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_bf16(w):
    """f32 → (hi, lo) bf16 pair with w ≈ hi + lo (error ≤ 2^-16 relative)."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _syrk_lower_kernel(T_ref, ahi_ref, alo_ref, bhi_ref, blo_ref, o_ref,
                       acc_ref, *, k_steps):
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    lower = i >= j

    @pl.when(jnp.logical_and(lower, k == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(lower)
    def _accumulate():
        # canonical (m, k) @ (k, n) contraction — the only bf16 matmul form
        # Mosaic lowers to the MXU; the j-operands arrive pre-transposed.
        # precision is pinned to DEFAULT: the library's global "highest"
        # would ask Mosaic for fp32 contract precision on bf16 operands
        # ("Bad lhs type"); bf16×bf16→f32 accumulation is already the exact
        # semantics the split encodes
        dn = (((1,), (0,)), ((), ()))
        prec = jax.lax.Precision.DEFAULT
        ahi, alo = ahi_ref[:], alo_ref[:]
        bhiT, bloT = bhi_ref[:], blo_ref[:]
        acc_ref[:] += (
            jax.lax.dot_general(ahi, bhiT, dn,
                                preferred_element_type=jnp.float32,
                                precision=prec)
            + jax.lax.dot_general(ahi, bloT, dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
            + jax.lax.dot_general(alo, bhiT, dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        )

    @pl.when(jnp.logical_and(lower, k == k_steps - 1))
    def _write_lower():
        o_ref[:] = T_ref[:] - acc_ref[:]

    @pl.when(jnp.logical_and(~lower, k == k_steps - 1))
    def _write_upper():
        o_ref[:] = T_ref[:]


@functools.partial(
    jax.jit, static_argnames=("block", "block_k", "interpret")
)
def syrk_update_lower(T, W, *, block: int = 512, block_k: int = 512,
                      interpret: bool = False):
    """T − W @ Wᵀ with bf16x3 (HIGH-equivalent) accuracy on the lower
    triangle; the strict upper triangle of the result is T passed through
    (callers must treat it as undefined). T: (m, m) f32, W: (m, nb) f32;
    m and nb are padded up to the block sizes internally."""
    m, nb = W.shape
    mp = -(-m // block) * block
    nbp = -(-nb // block_k) * block_k
    Tp = jnp.pad(T, ((0, mp - m), (0, mp - m)))
    Wp = jnp.pad(W, ((0, mp - m), (0, nbp - nb)))
    hi, lo = split_bf16(Wp)
    hiT, loT = hi.T, lo.T
    p, ks = mp // block, nbp // block_k

    out = pl.pallas_call(
        functools.partial(_syrk_lower_kernel, k_steps=ks),
        grid=(p, p, ks),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            # upper (passthrough) tiles pin their W fetches to block (0, 0):
            # consecutive unchanged block indices skip the DMA, so the
            # skipped tiles cost bandwidth only for the T copy itself
            pl.BlockSpec((block, block_k),
                         lambda i, j, k: (jnp.where(i >= j, i, 0),
                                          jnp.where(i >= j, k, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, block_k),
                         lambda i, j, k: (jnp.where(i >= j, i, 0),
                                          jnp.where(i >= j, k, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block),
                         lambda i, j, k: (jnp.where(i >= j, k, 0),
                                          jnp.where(i >= j, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block),
                         lambda i, j, k: (jnp.where(i >= j, k, 0),
                                          jnp.where(i >= j, j, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, mp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, block), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * mp * mp * nbp,  # 3 bf16 passes on half the tiles, 2mnk
            bytes_accessed=4 * 2 * mp * mp + 2 * 2 * mp * nbp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Tp, hi, lo, hiT, loT)
    return out[:m, :m]


def _leaf_chol(T, interpret: bool):
    """Leaf factorization: the in-VMEM Pallas kernel up to 1024, split once
    above that (XLA's own Cholesky is latency-bound at these sizes: 3.4 ms
    at 2048 vs ~0.1 ms of FLOPs — see ops/pallas_chol.py)."""
    from stpy_tpu.ops.pallas_chol import chol_leaf

    n = T.shape[0]
    if n <= 1024:
        return chol_leaf(T, interpret=interpret)
    h = n // 2
    hi_p = jax.lax.Precision.HIGHEST
    L11 = _leaf_chol(T[:h, :h], interpret)
    eye = jnp.eye(h, dtype=T.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L11, eye, lower=True)
    Lp = jax.lax.dot(T[h:, :h], Linv.T, precision=hi_p)
    S = T[h:, h:] - jax.lax.dot(Lp, Lp.T, precision=hi_p)
    L22 = _leaf_chol(S, interpret)
    top = jnp.concatenate([L11, jnp.zeros((h, n - h), T.dtype)], axis=1)
    bot = jnp.concatenate([Lp, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def chol_blocked_syrk(A, nb: int = 2048, block: int = 512,
                      panel_precision=jax.lax.Precision.HIGH,
                      interpret: bool = False):
    """Right-looking blocked Cholesky with the Pallas lower-syrk trailing
    update. Trace-time unrolled (n/nb static steps): leaf factorizations run
    in the in-VMEM Pallas kernel (`_leaf_chol` — XLA's Cholesky is
    latency-bound at leaf sizes), panel solves are HIGH inverse-GEMMs, and
    ~all of the n³/3 MACs run through `syrk_update_lower` at 2x the bf16x3
    dense ceiling. Only the lower triangle of A is ever read. Inference-path
    only (not differentiable — use `chol_jittered` on gradient paths).
    Returns the lower factor with an explicitly zeroed upper triangle."""
    n = A.shape[0]
    pad = (-n) % nb
    if pad:
        Ap = jnp.zeros((n + pad, n + pad), A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        return chol_blocked_syrk(Ap, nb, block, panel_precision,
                                 interpret)[:n, :n]
    k = n // nb
    if k <= 1:
        return _leaf_chol(A, interpret)
    eye = jnp.eye(nb, dtype=A.dtype)
    cols = []
    T = A
    for j in range(k):
        Ljj = _leaf_chol(T[:nb, :nb], interpret)
        if j < k - 1:
            Linv = jax.scipy.linalg.solve_triangular(Ljj, eye, lower=True)
            B = T[nb:, :nb]
            W = jax.lax.dot(B, Linv.T, precision=panel_precision)
            col = jnp.concatenate([Ljj, W], axis=0)
            T = syrk_update_lower(T[nb:, nb:], W, block=block,
                                  interpret=interpret)
        else:
            col = Ljj
        cols.append(jnp.pad(col, ((j * nb, 0), (0, 0))))
    return jnp.concatenate(cols, axis=1)
