"""Round-3 TPU batch W — last link in the matern 1.8e-8 chain: are the
SCALED COORDINATE PAIRS themselves shape-dependent?

State of the hunt (batches S/T/U/V): every stage is clean in isolation,
the production Gram is deterministic and tiling-independent
(one-shot == per-block bitwise), yet its worst entries are 1.8e-8 off
while a gridless replay of the same (i, j) coordinates is clean at
4e-12. The replay re-scaled its 8-row coordinate arrays separately —
the ONLY remaining difference is `_df_scale_coords` evaluated at
(16384, 8) vs (8, 8).

  W1. full-shape (16384, 8) scaling vs host f64 — max |xh+xl − x/γ|.
  W2. rows of the full-shape scaling vs the same rows scaled in a
      small call — bitwise comparison of hi and lo limbs.
  W3. if the pairs agree: recompute the production Gram from the
      full-shape pairs AND from per-row-block re-scaled pairs, compare
      at the batch-U worst entries.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_w.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from stpy_tpu.ops.pallas_gram_df import _df_scale_coords, _gram_df_pallas

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5
WORST = [(153, 7766), (288, 15179), (25, 3482), (42, 11910)]


def k64f(sq):
    t = np.sqrt(2.0 * NU * sq)
    return (1.0 + t + t * t / 3.0) * np.exp(-t)


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-1, 1, (N, D)), np.float32)
    xt = np.asarray(rng.uniform(-1, 1, (T, D)), np.float32)

    inv64 = 1.0 / np.float64(G)
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))

    bh, bl = _df_scale_coords(jnp.asarray(x), ih, il)
    got = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
    ref = x.astype(np.float64) / G
    print(f"W1 full-shape scale abs err: {np.max(np.abs(got - ref)):.2e}",
          flush=True)

    ok_h = ok_l = True
    for (_, j) in WORST:
        sh, sl = _df_scale_coords(jnp.asarray(x[j:j + 8]), ih, il)
        ok_h &= np.array_equal(np.asarray(sh[0]), np.asarray(bh[j]))
        ok_l &= np.array_equal(np.asarray(sl[0]), np.asarray(bl[j]))
    print(f"W2 full-call vs small-call pairs: hi equal {ok_h}, "
          f"lo equal {ok_l}", flush=True)

    ah, al = _df_scale_coords(jnp.asarray(xt), ih, il)
    kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
    Kh, Kl = _gram_df_pallas(ah, al, bh, bl, kap, block_m=256, block_n=256,
                             interpret=False, family="matern", nu=NU)
    K = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    Kl_np = np.asarray(Kl, np.float64)
    Kh_np = np.asarray(Kh, np.float64)
    for (i, j) in WORST:
        sq = ((xt[i].astype(np.float64) - x[j].astype(np.float64)) / G) ** 2
        sq = sq.sum()
        r = k64f(sq)
        print(f"W3 ({i},{j}): one-shot err {abs(K[i, j] - r):.2e}  "
              f"hi-only err {abs(Kh_np[i, j] - r):.2e}  "
              f"lo {Kl_np[i, j]:.3e}  true-lo {r - np.float32(r):.3e}",
              flush=True)
    # if the lo limb is globally lost, |Kl| collapses vs eps/2*|Kh|
    print(f"W3 |Kl| median {np.median(np.abs(Kl_np)):.2e}  "
          f"eps/2*|Kh| median {np.median(np.abs(Kh_np)) * 6e-8:.2e}",
          flush=True)
    print("BATCHW_DONE", flush=True)


if __name__ == "__main__":
    main()
