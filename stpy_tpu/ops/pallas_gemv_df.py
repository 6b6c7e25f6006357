"""Fused double-float GEMV (Ah + Al)·v as one Pallas kernel.

The exact df GEMV (ops/compensated.gemv_df: TwoProd products + pairwise
TwoSum tree, no accumulator floor) is what lifted matern/composite
double-mode posterior means off their 1.2–2.4e-6 chunk-accumulation floor
(r3 batch C/D: se mean 4.2e-7 → 9.7e-8). Its HLO form, however,
materializes the (rows, k) TwoProd transients in HBM — ~5 extra full
passes over the Gram per call, ~50–60 ms each at n=16k, and the double
path calls it four times per fit+predict (3 refinement residuals + the
predictive mean). This kernel runs the identical arithmetic with the
transients held in VMEM: HBM traffic = one read of (Ah, Al) per call
(~2 GB at n=16k, ~3 ms at HBM speed; VPU-bound in practice).

Kernel structure per (row-tile i, k-tile kt):
  * load (block_m, block_k) tiles of Ah/Al and the matching (1, block_k)
    slice of v;
  * TwoProd(Ah, v) on the VPU, lo-correction Al·v folded into the error
    stream;
  * pairwise TwoSum tree over lanes down to the 128-lane tile granularity
    (aligned slices only — Mosaic vectorizes each level);
  * TwoSum-fold the (block_m, 128) partial into a VMEM (hi, lo)
    accumulator across k-tiles; written out once at the last k-step.

The caller folds the final 128 lanes with the barrier-guarded HLO EFT
tree (tiny: (m, 128)). Result error ~ depth·eps² — identical contract to
the HLO `gemv_df`, asserted against it and f64 in tests
(tests/test_blocked_solves.py). No reference counterpart: the torch
reference is f64 end-to-end (stpy/continuous_processes/gauss_procc.py:
355-371) and needs no compensated arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stpy_tpu.ops.pallas_gram_df import _make_eft


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gemv_kernel(v_ref, vl_ref, ah_ref, al_ref, oh_ref, ol_ref, acc_h,
                 acc_l, *, k_steps, barriers):
    two_sum, _fast_two_sum, two_prod, _df_add = _make_eft(barriers)
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        acc_h[:] = jnp.zeros_like(acc_h)
        acc_l[:] = jnp.zeros_like(acc_l)

    v = v_ref[:]                        # (1, block_k) — broadcasts over rows
    ah = ah_ref[:]
    ph, pe = two_prod(ah, v)
    pe = pe + (al_ref[:] * v + ah * vl_ref[:])   # df v: Al·vl dropped (eps²)
    # lane tree block_k -> 128 (aligned halves; each level vectorizes)
    while ph.shape[1] > 128:
        m = ph.shape[1] // 2
        nh, he = two_sum(ph[:, :m], ph[:, m:])
        pe = pe[:, :m] + pe[:, m:] + he
        ph = nh
    sh, e = two_sum(acc_h[:], ph)
    acc_h[:] = sh
    acc_l[:] = acc_l[:] + (pe + e)

    @pl.when(kt == k_steps - 1)
    def _write():
        oh_ref[:] = acc_h[:]
        ol_ref[:] = acc_l[:]


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_k", "interpret")
)
def _gemv_pallas(Ah, Al, v, vl, *, block_m: int, block_k: int,
                 interpret: bool):
    m, k = Ah.shape
    mpad, kpad = _round_up(m, block_m), _round_up(k, block_k)
    Ahp = jnp.pad(Ah, ((0, mpad - m), (0, kpad - k)))
    Alp = jnp.pad(Al, ((0, mpad - m), (0, kpad - k)))
    vp = jnp.pad(v.reshape(1, -1), ((0, 0), (0, kpad - k)))
    vlp = jnp.pad(vl.reshape(1, -1), ((0, 0), (0, kpad - k)))
    m_steps, k_steps = mpad // block_m, kpad // block_k

    kern = functools.partial(_gemv_kernel, k_steps=k_steps,
                             barriers=interpret)
    oh, ol = pl.pallas_call(
        kern,
        grid=(m_steps, k_steps),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda i, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, kt: (i, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, kt: (i, kt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 128), lambda i, kt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 128), lambda i, kt: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mpad, 128), jnp.float32),
            jax.ShapeDtypeStruct((mpad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # two double-buffered (block_m, block_k) input windows plus the
            # TwoProd transients put 512x1024 tiles near Mosaic's 16 MiB
            # scoped default; raise the budget (128 MiB physical VMEM)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * mpad * kpad,
            bytes_accessed=4 * (2 * mpad * kpad + kpad * m_steps),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vp, vlp, Ahp, Alp)

    # fold the last 128 lanes in barrier-guarded HLO df (tiny: (m, 128)).
    # The extra barrier on the kernel outputs is LOAD-BEARING: when the
    # interpret-mode kernel is inlined into the same jaxpr, XLA rewrites
    # the fold's EFT using its view of the producers (measured: 8e-15 →
    # 6.7e-8 on a 128x128 GEMV); opaque inputs restore exactness.
    two_sum, fast_two_sum, _, _ = _make_eft(True)
    h, l = jax.lax.optimization_barrier((oh, ol))
    while h.shape[1] > 1:
        half = h.shape[1] // 2
        nh, e = two_sum(h[:, :half], h[:, half:])
        l = l[:, :half] + l[:, half:] + e
        h = nh
    rh, rl = fast_two_sum(h[:, 0], l[:, 0])
    return rh[:m], rl[:m]


def gemv_df_fused(Ah, Al, v, *, block_m: int = 512, block_k: int = 1024,
                  interpret: bool | None = None, vl=None):
    """EXACT df GEMV (Ah + Al)·(v + vl) → (hi, lo) of shape (m,), fused in
    VMEM. `vl` is an optional df lo companion of v (see
    ops/compensated.gemv_df — a single-f32 alpha caps the posterior mean).

    On TPU runs the Mosaic kernel; on CPU without x64 runs the same kernel
    in interpret mode (barrier-guarded EFT); on CPU with x64 falls back to
    the exact f64 GEMV (the test contract — identical to
    ops/compensated.gemv_df's dispatch-free HLO result to ~1e-13).
    """
    Ah = jnp.asarray(Ah)
    v = jnp.asarray(v).reshape(-1)
    vl = (jnp.zeros_like(v) if vl is None
          else jnp.asarray(vl).reshape(-1))
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
    if not on_tpu and not interpret:
        if jax.config.jax_enable_x64:
            r = (Ah.astype(jnp.float64) + jnp.asarray(Al, jnp.float64)) @ (
                v.astype(jnp.float64) + vl.astype(jnp.float64))
            hi = r.astype(jnp.float32).astype(jnp.float64)
            return hi.astype(Ah.dtype), (r - hi).astype(Ah.dtype)
        interpret = True
    f32 = jnp.float32
    return _gemv_pallas(Ah.astype(f32), jnp.asarray(Al, f32),
                        v.astype(f32), vl.astype(f32), block_m=block_m,
                        block_k=block_k, interpret=bool(interpret))
