"""Round-3 TPU batch U — find the exact entries behind the residual
1.8e-8 matern Gram error and replay them in isolation.

Batch T cleared every stage AND the composed production kernel on a
512x1024 subset (1.4e-10); batch S still measures 1.8e-8 over the full
512x16384 cross Gram. So the error is DATA-DEPENDENT — some specific
(test, train) geometry. This batch:

  U1. recomputes the full cross Gram, localizes the worst entries
      (indices, sq, t, entry value, error), and reports the top-8.
  U2. replays the worst entries' exact coordinate pairs through the
      gridless fused kernel (d-loop + entry, batch T3 form) — does the
      error reproduce outside the production grid?
  U3. replays the worst entries' EXACT df sq through the entry-only
      stage kernel — is it the entry math at THESE sq values?

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_u.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_r3_batch_p import run_stage
from stpy_tpu.ops.pallas_gram_df import (
    _df_entry, _df_scale_coords, _make_eft, _make_two_prod_const,
    gram_matern_df,
)

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5


def k64f(sq):
    t = np.sqrt(2.0 * NU * sq)
    return (1.0 + t + t * t / 3.0) * np.exp(-t)


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    xt = rng.uniform(-1, 1, (T, D)).astype(np.float32).astype(np.float64)

    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(x, jnp.float32), G, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)

    a = xt / G
    b = x / G
    na = (a * a).sum(1)
    nb = (b * b).sum(1)
    sq = np.maximum(na[:, None] + nb[None, :] - 2.0 * (a @ b.T), 0.0)
    # exact per-entry sq (the GEMM form loses digits at small r): redo the
    # top candidates exactly below
    ref = k64f(sq)
    err = np.abs(got - ref)
    flat = np.argsort(err.reshape(-1))[::-1][:8]
    idx = [np.unravel_index(f, err.shape) for f in flat]
    for (i, j) in idx:
        sq_exact = (((xt[i] - x[j]) / G) ** 2).sum()
        e_exact = abs(got[i, j] - k64f(sq_exact))
        print(f"U1 ({i:4d},{j:5d}): sq {sq_exact:.6e}  t "
              f"{np.sqrt(2 * NU * sq_exact):9.5f}  entry "
              f"{k64f(sq_exact):.6e}  err(gemm-ref) {err[i, j]:.2e}  "
              f"err(exact-ref) {e_exact:.2e}", flush=True)

    # U2: replay through the gridless fused kernel — build (8, 128)-padded
    # coordinate blocks holding the worst pairs
    inv64 = 1.0 / np.float64(G)
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))
    rows = np.stack([xt[i] for (i, j) in idx]).astype(np.float32)
    cols = np.stack([x[j] for (i, j) in idx]).astype(np.float32)
    ah, al = _df_scale_coords(jnp.asarray(rows), ih, il)
    bh, bl = _df_scale_coords(jnp.asarray(cols), ih, il)
    dp, m = 128, 8

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
            family="matern", nu=NU, eft=eft,
            bitcast=lambda i: pltpu.bitcast(i, jnp.float32),
            tpc=_make_two_prod_const(False),
        )
        oh_ref[:] = eh
        ol_ref[:] = el

    pad = lambda v: jnp.pad(v, ((0, 0), (0, dp - D)))
    oh, ol = pl.pallas_call(
        functools.partial(fused_kernel, d=D),
        out_shape=[
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(pad(ah), pad(al),
      jnp.pad(pad(bh).T, ((0, 0), (0, 128 - m))),
      jnp.pad(pad(bl).T, ((0, 0), (0, 128 - m))))
    for k, (i, j) in enumerate(idx):
        v = float(oh[k, k]) + float(ol[k, k])
        sq_exact = (((xt[i] - x[j]) / G) ** 2).sum()
        print(f"U2 ({i:4d},{j:5d}): fused-replay err "
              f"{abs(v - k64f(sq_exact)):.2e}", flush=True)

    # U3: entry-only on the exact df sq of the worst pairs
    sq8 = np.array([(((xt[i] - x[j]) / G) ** 2).sum() for (i, j) in idx])
    blk = np.zeros((512, 128))
    blk[:8, 0] = sq8
    sqh = np.asarray(blk, np.float32)
    sql = np.asarray(blk - sqh.astype(np.float64), np.float32)
    oh3, ol3 = run_stage(jnp.asarray(sqh), jnp.asarray(sql), nu=NU,
                         stage="entry")
    for k, (i, j) in enumerate(idx):
        v = float(oh3[k, 0]) + float(ol3[k, 0])
        print(f"U3 ({i:4d},{j:5d}): entry-only err "
              f"{abs(v - k64f(sq8[k])):.2e}", flush=True)
    print("BATCHU_DONE", flush=True)


if __name__ == "__main__":
    main()
