"""Round-3 TPU batch V — is the matern df Gram error GRID-SIZE dependent?

Batch U: the worst entries of the (512, 16384) production Gram carry an
identical 1.80e-8 error, and the SAME coordinate pairs replay clean
(4e-12) through the same per-tile arithmetic in a gridless kernel;
batch T4 showed the production `_gram_df_pallas` itself is clean at
(512, 512). Same per-tile code, same inputs, different grid → different
numbers would mean a Mosaic pipelining/codegen issue at larger grids.

  V1. one-shot (512, 16384) call vs 32 per-block (512, 512) calls on
      identical inputs — elementwise max |Δ|, count of entries > 1e-9,
      and the tile pattern of the disagreement.
  V2. one-shot call twice — bitwise identical? (a DMA/pipelining race
      would be nondeterministic)
  V3. block_m/block_n sweep on the one-shot shape: does any tiling
      agree with the per-block truth?

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_v.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from stpy_tpu.ops.pallas_gram_df import _df_scale_coords, _gram_df_pallas

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-1, 1, (N, D)), np.float32)
    xt = np.asarray(rng.uniform(-1, 1, (T, D)), np.float32)

    inv64 = 1.0 / np.float64(G)
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))
    ah, al = _df_scale_coords(jnp.asarray(xt), ih, il)
    bh, bl = _df_scale_coords(jnp.asarray(x), ih, il)
    kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))

    run = lambda bh_, bl_, bm, bn: _gram_df_pallas(
        ah, al, bh_, bl_, kap, block_m=bm, block_n=bn, interpret=False,
        family="matern", nu=NU)

    # V1: one-shot vs per-block
    Kh1, Kl1 = run(bh, bl, 256, 256)
    one = np.asarray(Kh1, np.float64) + np.asarray(Kl1, np.float64)
    blocks = []
    for c0 in range(0, N, 512):
        Khb, Klb = run(bh[c0:c0 + 512], bl[c0:c0 + 512], 256, 256)
        blocks.append(np.asarray(Khb, np.float64)
                      + np.asarray(Klb, np.float64))
    per = np.concatenate(blocks, axis=1)
    dd = np.abs(one - per)
    bad = dd > 1e-9
    print(f"V1 one-shot vs per-block: max |d| {np.max(dd):.2e}  "
          f"n>1e-9: {int(bad.sum())} of {dd.size}", flush=True)
    if bad.any():
        bi, bj = np.nonzero(bad)
        print(f"V1 bad rows {np.unique(bi // 256)} (row-tiles), "
              f"col-tiles {np.unique(bj // 256)[:20]} ...", flush=True)

    # V2: determinism of the one-shot call
    Kh2, Kl2 = run(bh, bl, 256, 256)
    same = (np.array_equal(np.asarray(Kh1), np.asarray(Kh2))
            and np.array_equal(np.asarray(Kl1), np.asarray(Kl2)))
    print(f"V2 one-shot repeat bitwise identical: {same}", flush=True)

    # V3: tiling sweep
    for bm, bn in ((256, 512), (512, 256), (512, 512), (128, 256)):
        Khs, Kls = run(bh, bl, bm, bn)
        sw = np.asarray(Khs, np.float64) + np.asarray(Kls, np.float64)
        print(f"V3 block ({bm},{bn}) vs per-block truth: max |d| "
              f"{np.max(np.abs(sw - per)):.2e}", flush=True)
    print("BATCHV_DONE", flush=True)


if __name__ == "__main__":
    main()
