"""Round-3 TPU batch X — staged dumps from an EXACT replica of the
production df Gram pallas_call.

All prior stage probes (P/S/T/U) used simplified call configurations
(gridless, 128-sublane y windows, constant kappa) and are CLEAN; the
production call (grid, (8, block_n) y windows, SMEM kappa) is 1.8e-8
off, concentrated at t ≈ 2.73 (the dataset's minimum-sq band — and,
notably, where the df exp's range reduction leaves r ≈ 0.0417 near
zero with k = 4). This batch replicates the production BlockSpecs/grid
EXACTLY and swaps only the kernel OUTPUT:

  X1. production call on a (512, 512) slice that CONTAINS the known
      worst pairs — reproduce the error at production shape.
  X2. same call configuration, kernel dumps (acc_h, acc_l).
  X3. same, dumps (th, tl) after the df sqrt and √(2ν) multiply.
  X4. same, dumps (eh, el) after the df exp (before P·e^{-t}).

Whichever dump first deviates from host f64 is the stage Mosaic
compiles differently under the production window configuration.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_x.py
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
    _df_entry, _df_exp, _df_scale_coords, _host_veltkamp32, _make_eft,
    _make_two_prod_const, _round_up, _split_f64,
)

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5
WORST_J = [7766, 15179, 3482, 11910]
WORST_I = [153, 288, 25, 42]


def _staged_kernel(kap_ref, xh_ref, xl_ref, yh_ref, yl_ref,
                   oh_ref, ol_ref, *, d, family, nu, stage):
    """_gram_df_kernel verbatim, with stage outputs."""
    eft = _make_eft(False)
    two_sum, fast_two_sum, two_prod, df_add = eft
    tpc = _make_two_prod_const(False)
    xh, xl = xh_ref[:], xl_ref[:]
    yh, yl = yh_ref[:], yl_ref[:]
    acc_h = jnp.zeros((xh.shape[0], yh.shape[1]), jnp.float32)
    acc_l = jnp.zeros_like(acc_h)
    for c in range(d):
        dh, de = two_sum(xh[:, c:c + 1], -yh[c:c + 1, :])
        dl = de + (xl[:, c:c + 1] - yl[c:c + 1, :])
        sh, se = two_prod(dh, dh)
        se = se + 2.0 * dh * dl
        acc_h, acc_l = df_add(acc_h, acc_l, sh, se)
    if stage == "acc":
        oh_ref[:], ol_ref[:] = acc_h, acc_l
        return
    if stage in ("t", "exp"):
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
        ch, cl = _split_f64(math.sqrt(2.0 * nu))
        th, te = tpc(sh, _host_veltkamp32(ch))
        te = te + sh * cl + ch * sl
        th, tl = fast_two_sum(th, te)
        if stage == "t":
            oh_ref[:], ol_ref[:] = th, tl
            return
        eh, el = _df_exp(-th, -tl, eft,
                         lambda i: pltpu.bitcast(i, jnp.float32), tpc)
        oh_ref[:], ol_ref[:] = eh, el
        return
    # stage == "entry": the full production tail including SMEM kappa
    oh, ol = _df_entry(
        acc_h, acc_l, kap_ref[0, 0], kap_ref[0, 1],
        family=family, nu=nu, eft=eft,
        bitcast=lambda i: pltpu.bitcast(i, jnp.float32),
        tpc=tpc,
    )
    oh_ref[:] = oh
    ol_ref[:] = ol


@functools.partial(jax.jit, static_argnames=("stage",))
def staged_call(xh, xl, yh, yl, kappa_df, *, stage):
    """EXACT copy of _gram_df_pallas's call configuration."""
    n, d = xh.shape
    m = yh.shape[0]
    block_m = block_n = 256
    dp = _round_up(max(d, 1), 8)
    np_, mp = _round_up(n, block_m), _round_up(m, block_n)

    def padx(a):
        return jnp.pad(a, ((0, np_ - n), (0, _round_up(d, 128) - d)))

    def pady(a):
        return jnp.pad(a, ((0, mp - m), (0, dp - d))).T

    kern = functools.partial(_staged_kernel, d=d, family="matern", nu=NU,
                             stage=stage)
    oh, ol = pl.pallas_call(
        kern,
        grid=(np_ // block_m, mp // block_n),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, _round_up(d, 128)), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, _round_up(d, 128)), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, mp), jnp.float32),
            jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        ],
        interpret=False,
    )(kappa_df, padx(xh), padx(xl), pady(yh), pady(yl))
    return oh[:n, :m], ol[:n, :m]


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-1, 1, (N, D)), np.float32)
    xt = np.asarray(rng.uniform(-1, 1, (T, D)), np.float32)
    cols = np.concatenate([x[j:j + 128] for j in WORST_J], axis=0)  # 512

    inv64 = 1.0 / np.float64(G)
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))
    ah, al = _df_scale_coords(jnp.asarray(xt), ih, il)
    bh, bl = _df_scale_coords(jnp.asarray(cols), ih, il)
    kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))

    a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    b64 = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
    sq64 = ((a64[:, None, :] - b64[None, :, :]) ** 2).sum(-1)
    t64 = np.sqrt(2.0 * NU * sq64)
    e64 = np.exp(-t64)
    k64 = (1.0 + t64 + t64 * t64 / 3.0) * e64
    refs = {"acc": sq64, "t": t64, "exp": e64, "entry": k64}

    for stage in ("entry", "acc", "t", "exp"):
        oh, ol = staged_call(ah, al, bh, bl, kap, stage=stage)
        got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
        d_ = np.abs(got - refs[stage])
        i, j = np.unravel_index(np.argmax(d_), d_.shape)
        print(f"X {stage:5s}: abs err max {np.max(d_):.2e} at "
              f"(sq={sq64[i, j]:.4e}, t={t64[i, j]:.5f})", flush=True)
    print("BATCHX_DONE", flush=True)


if __name__ == "__main__":
    main()
