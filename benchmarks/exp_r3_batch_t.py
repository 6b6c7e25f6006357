"""Round-3 TPU batch T — localize the γ≠1 df corruption (batch S: the
matern Gram is clean at γ=1 on prescaled coords, 1.8e-8 off at γ=1.1;
an exact-f32-semantics emulation of the whole d-loop+entry is clean at
1.7e-13, so a device lowering differs from fl semantics somewhere in
the LIMB path that γ=1 zeroes out).

  T1. `_df_scale_coords` output on device (eager + jitted) vs host f64:
      is the coordinate lo limb already wrong before the kernel?
  T2. a Pallas kernel running ONLY the d-loop (verbatim from
      _gram_df_kernel) on the scaled pairs, dumping (acc_h, acc_l) —
      is the df squared distance wrong in-kernel?

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_t.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from stpy_tpu.ops.pallas_gram_df import _df_scale_coords, _make_eft

G, D = 1.1, 8


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-1, 1, (2048, D)), np.float32)
    x64 = x.astype(np.float64) / G

    inv64 = 1.0 / np.float64(G)
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))

    # T1a eager
    xh, xl = _df_scale_coords(jnp.asarray(x), ih, il)
    got = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    print(f"T1a scale_coords eager   abs err: {np.max(np.abs(got - x64)):.2e}"
          f"  (|xl| max {np.max(np.abs(np.asarray(xl))):.2e})", flush=True)

    # T1b jitted
    xh_j, xl_j = jax.jit(_df_scale_coords)(jnp.asarray(x), ih, il)
    got = np.asarray(xh_j, np.float64) + np.asarray(xl_j, np.float64)
    print(f"T1b scale_coords jitted  abs err: {np.max(np.abs(got - x64)):.2e}",
          flush=True)

    # T2: d-loop only, verbatim from _gram_df_kernel
    def dloop_kernel(xh_ref, xl_ref, yh_ref, yl_ref, oh_ref, ol_ref, *, d):
        eft = _make_eft(False)
        two_sum, fast_two_sum, two_prod, df_add = eft
        xh_, xl_ = xh_ref[:], xl_ref[:]
        yh_, yl_ = yh_ref[:], yl_ref[:]
        acc_h = jnp.zeros((xh_.shape[0], yh_.shape[1]), jnp.float32)
        acc_l = jnp.zeros_like(acc_h)
        for c in range(d):
            dh, de = two_sum(xh_[:, c:c + 1], -yh_[c:c + 1, :])
            dl = de + (xl_[:, c:c + 1] - yl_[c:c + 1, :])
            sh, se = two_prod(dh, dh)
            se = se + 2.0 * dh * dl
            acc_h, acc_l = df_add(acc_h, acc_l, sh, se)
        oh_ref[:] = acc_h
        ol_ref[:] = acc_l

    m = 512
    xa, xb = x[:m], x[m:2 * m]
    ah, al = _df_scale_coords(jnp.asarray(xa), ih, il)
    bh, bl = _df_scale_coords(jnp.asarray(xb), ih, il)
    # lane-pad d -> 128 like the real kernel's VMEM layout
    dp = 128
    pad = lambda a: jnp.pad(a, ((0, 0), (0, dp - D)))
    kern = functools.partial(dloop_kernel, d=D)
    oh, ol = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
    )(pad(ah), pad(al), pad(bh).T, pad(bl).T)

    # reference: EXACT f64 sq of what the df pairs actually represent
    a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    b64 = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
    sq64 = ((a64[:, None, :] - b64[None, :, :]) ** 2).sum(-1)
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    rel = np.abs(got - sq64) / np.maximum(sq64, 1e-12)
    print(f"T2 d-loop sq df: abs err {np.max(np.abs(got - sq64)):.2e}"
          f"  rel err {np.max(rel):.2e}", flush=True)

    # T3: d-loop + matern entry COMPOSED in one gridless kernel (the
    # remaining difference vs the real gram kernel is only grid/tiling)
    from stpy_tpu.ops.pallas_gram_df import (
        _df_entry, _make_two_prod_const,
    )
    from jax.experimental.pallas import tpu as pltpu

    nu = 2.5

    def fused_kernel(xh_ref, xl_ref, yh_ref, yl_ref, oh_ref, ol_ref, *, d):
        eft = _make_eft(False)
        two_sum, fast_two_sum, two_prod, df_add = eft
        xh_, xl_ = xh_ref[:], xl_ref[:]
        yh_, yl_ = yh_ref[:], yl_ref[:]
        acc_h = jnp.zeros((xh_.shape[0], yh_.shape[1]), jnp.float32)
        acc_l = jnp.zeros_like(acc_h)
        for c in range(d):
            dh, de = two_sum(xh_[:, c:c + 1], -yh_[c:c + 1, :])
            dl = de + (xl_[:, c:c + 1] - yl_[c:c + 1, :])
            sh, se = two_prod(dh, dh)
            se = se + 2.0 * dh * dl
            acc_h, acc_l = df_add(acc_h, acc_l, sh, se)
        eh, el = _df_entry(
            acc_h, acc_l, jnp.float32(1.0), jnp.float32(0.0),
            family="matern", nu=nu, eft=eft,
            bitcast=lambda i: pltpu.bitcast(i, jnp.float32),
            tpc=_make_two_prod_const(False),
        )
        oh_ref[:] = eh
        ol_ref[:] = el

    oh3, ol3 = pl.pallas_call(
        functools.partial(fused_kernel, d=D),
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(pad(ah), pad(al), pad(bh).T, pad(bl).T)
    t64 = np.sqrt(2.0 * nu * sq64)
    k64 = (1.0 + t64 + t64 * t64 / 3.0) * np.exp(-t64)
    got3 = np.asarray(oh3, np.float64) + np.asarray(ol3, np.float64)
    print(f"T3 fused d-loop+entry (gridless): abs err "
          f"{np.max(np.abs(got3 - k64)):.2e}", flush=True)

    # T4: the REAL production pallas call on the same pairs
    from stpy_tpu.ops.pallas_gram_df import _gram_df_pallas

    kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
    Kh, Kl = _gram_df_pallas(ah, al, bh, bl, kap, block_m=256, block_n=256,
                             interpret=False, family="matern", nu=nu)
    got4 = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    print(f"T4 real _gram_df_pallas:          abs err "
          f"{np.max(np.abs(got4 - k64)):.2e}", flush=True)
    print("BATCHT_DONE", flush=True)


if __name__ == "__main__":
    main()
