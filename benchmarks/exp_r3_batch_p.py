"""Round-3 TPU batch P — stage isolation for the df matern entry error.

Batch I measured the Mosaic matern52 df entry at max |err| ≈ 5.4e-8 (vs
se at 3.0e-10), and a host-side emulation of the Newton-sqrt path with
2^-12-approximate hardware sqrt/divide predicts ~2.6e-11 — so either the
measurement predates the second Newton step (commit timing is ambiguous)
or a DIFFERENT stage dominates on the chip. This batch feeds EXACT df
squared distances (hi, lo) straight into a Pallas kernel that mirrors
`_df_entry`'s matern branch and returns each intermediate:

  P1. stage "t"     — t = √(2ν·sq) as (hi, lo)
  P2. stage "exp"   — e^{-t} as (hi, lo)
  P3. stage "entry" — P_ν(t)·e^{-t} as (hi, lo)

each compared against host f64 over sq ∈ [1e-6, 120] (log grid). The
stage whose relative error jumps from ~1e-11 to ~1e-8 is the culprit.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_p.py
"""

import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stpy_tpu.ops.pallas_gram_df import (
    _df_exp, _host_veltkamp32, _make_eft, _make_two_prod_const, _split_f64,
)


def _stage_kernel(sqh_ref, sql_ref, oh_ref, ol_ref, *, nu, stage):
    eft = _make_eft(False)                      # Mosaic path: no barriers
    two_sum, fast_two_sum, two_prod, df_add = eft
    tpc = _make_two_prod_const(False)
    bitcast = lambda i: pltpu.bitcast(i, jnp.float32)
    acc_h, acc_l = sqh_ref[:], sql_ref[:]

    # --- verbatim matern branch of _df_entry (post-fix: multiply-only
    # Newton corrections via a refined reciprocal; the divide-based
    # corrections floored at delta_div*delta_1 = 5.9e-8, batch P run 1) --
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
    if stage == "sl":                       # the sqrt (hi, lo) pair itself
        oh_ref[:], ol_ref[:] = sh, sl
        return

    ch, cl = _split_f64(math.sqrt(2.0 * nu))
    if stage == "t2":
        # the ORIGINAL in-kernel constant split — kept as the regression
        # witness: Mosaic constant-folds it and the error term dies
        # (5.9e-8 flat, batch P3 run 1 stage "t")
        th, te = two_prod(sh, ch)
        te = te + sh * cl + ch * sl
        th, tl = fast_two_sum(th, te)
        oh_ref[:], ol_ref[:] = th, tl
        return

    # the SHIPPED path: host-presplit constant TwoProd
    th, te = tpc(sh, _host_veltkamp32(ch))
    te = te + sh * cl + ch * sl
    th, tl = fast_two_sum(th, te)

    if stage == "t":
        oh_ref[:], ol_ref[:] = th, tl
        return

    eh, el = _df_exp(-th, -tl, eft, bitcast, tpc)
    if stage == "exp":
        oh_ref[:], ol_ref[:] = eh, el
        return

    if nu == 1.5:
        ph, pe2 = two_sum(1.0, th)
        ph, pl_ = fast_two_sum(ph, pe2 + tl)
    elif nu == 2.5:
        qh, qe = two_prod(th, th)
        qe = qe + 2.0 * th * tl
        oth, otl = _split_f64(1.0 / 3.0)
        q3h, q3e = tpc(qh, _host_veltkamp32(oth))
        q3e = q3e + qh * otl + qe * oth
        q3h, q3l = fast_two_sum(q3h, q3e)
        ph, pe2 = two_sum(1.0, th)
        ph, pl_ = fast_two_sum(ph, pe2 + tl)
        ph, pl_ = df_add(ph, pl_, q3h, q3l)
    else:
        ph, pl_ = jnp.ones_like(th), jnp.zeros_like(th)
    rh_, re_ = two_prod(eh, ph)
    re_ = re_ + eh * pl_ + el * ph
    oh, ol = fast_two_sum(rh_, re_)
    oh_ref[:], ol_ref[:] = oh, ol


@functools.partial(jax.jit, static_argnames=("nu", "stage"))
def run_stage(sqh, sql, *, nu, stage):
    kern = functools.partial(_stage_kernel, nu=nu, stage=stage)
    return pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(sqh.shape, jnp.float32),
            jax.ShapeDtypeStruct(sqh.shape, jnp.float32),
        ],
    )(sqh, sql)


def main():
    m = 512
    sq64 = np.logspace(-6, np.log10(120.0), m * 128).reshape(m, 128)
    sqh = np.asarray(sq64, np.float32)
    sql = np.asarray(sq64 - sqh.astype(np.float64), np.float32)
    sqx = sqh.astype(np.float64) + sql.astype(np.float64)  # what we feed

    for nu in (1.5, 2.5):
        t64 = np.sqrt(2.0 * nu * sqx)
        e64 = np.exp(-t64)
        if nu == 1.5:
            p64 = (1.0 + t64) * e64
        else:
            p64 = (1.0 + t64 + t64 * t64 / 3.0) * e64
        refs = {"t": t64, "t2": t64, "sl": np.sqrt(sqx),
                "exp": e64, "entry": p64}
        for stage in ("sl", "t", "t2", "exp", "entry"):
            oh, ol = run_stage(jnp.asarray(sqh), jnp.asarray(sql),
                               nu=nu, stage=stage)
            got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
            ref = refs[stage]
            rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
            ab = np.abs(got - ref)
            i = np.unravel_index(np.argmax(ab), ab.shape)
            print(f"P nu={nu} stage={stage:5s}: rel max {np.max(rel):.2e}"
                  f"  abs max {np.max(ab):.2e} (at sq={sqx[i]:.3e},"
                  f" ref={ref[i]:.3e})", flush=True)
    print("BATCHP_DONE", flush=True)


if __name__ == "__main__":
    main()
