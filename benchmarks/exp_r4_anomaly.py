"""Round-4 TPU batch — root-cause the 1.8e-8 matern production-Gram
anomaly (VERDICT r3 task 2).

Status from r3: S3 (full path, γ=1.1, 16384 cols) measures 1.8e-8
worst-case entry error at the dataset's min-sq band (t ≈ 2.73); the
batch-X replica (identical BlockSpecs/grid, 512 cols containing the worst
pairs, host-presplit 1/γ pairs fed eagerly) is CLEAN, as is every
isolated stage (S1/S2/P4 ≤ 1e-10).

A CPU error-model fact found this round: t ≈ 2.73 = 1 + √3 is EXACTLY
where |d/dt[t²(1+t)e^{-t}]| peaks — i.e. where ANY relative perturbation
of t (or sq) produces its maximal absolute entry error. A rel-δ in sq
yields max abs entry err δ/2 · t²(1+t)e^{-t}/3|_{t=1+√3} ≈ 0.302·δ.
Measured 1.8e-8 ⇒ δ_sq ≈ 6e-8 ≈ f32 eps/2: SOMETHING in the full-size
path rounds sq (or t) to plain f32 accuracy for the worst entries. This
batch separates the candidate somethings:

  A1. S3 repeat (full path, γ=1.1 host float, 16384 cols) — baseline.
  A2. γ as a TRACED jnp scalar (the production params_dict semantics:
      _df_inv(f32 γ) represents 1/f32(1.1), rel 2.17e-8 off 1/1.1) with
      the f64 reference at γ=1.1 — the predicted systematic +1.3e-8.
      Also checked against the matched reference k(x/f32(1.1)).
  A3. X-style 512-col call, but coords scaled IN-JIT from γ (not fed as
      eager pairs) — separates scaling context from y-extent.
  A4. full 16384-col call with EAGERLY precomputed (ah, al, bh, bl)
      pairs fed to the inner pallas jit — the converse of A3.
  A5. grid-extent determinism: y = 32 copies of the same 512 cols; all
      j-tiles with identical content must produce IDENTICAL output bits;
      reports max |tile_j − tile_0| over copies.
  A6. stage dumps (acc / t / exp) at FULL y-extent (the X staged kernel
      with 16384 cols) — localizes within the real grid.

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_anomaly.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from exp_r3_batch_x import staged_call
from stpy_tpu.ops.pallas_gram_df import (
    _df_scale_coords, gram_matern_df,
)

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5


def k64_from_sq(sq):
    t = np.sqrt(2.0 * NU * sq)
    return (1.0 + t + t * t / 3.0) * np.exp(-t), t


def sq64(a, b):
    na = (a * a).sum(1)
    nb = (b * b).sum(1)
    s = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
    np.maximum(s, 0.0, out=s)
    return s


def report(tag, got, ref, t64):
    d = np.abs(got - ref)
    i, j = np.unravel_index(np.argmax(d), d.shape)
    print(f"{tag}: abs err max {d.max():.2e} at t={t64[i, j]:.4f} "
          f"(i={i}, j={j})", flush=True)
    return float(d.max())


def host_pairs(a, inv64):
    ih = jnp.asarray(np.float32(inv64))
    il = jnp.asarray(np.float32(inv64 - np.float64(np.float32(inv64))))
    return _df_scale_coords(jnp.asarray(a, jnp.float32), ih, il)


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    xt = rng.uniform(-1, 1, (T, D)).astype(np.float32).astype(np.float64)

    ref_sq = sq64(xt / G, x / G)
    ref_K, ref_t = k64_from_sq(ref_sq)

    # A1: S3 repeat — host float gamma, full path
    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(x, jnp.float32), G, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    report("A1 full-path host-float gamma   ", got, ref_K, ref_t)

    # A2: traced gamma (production semantics) vs both references
    gj = jnp.asarray(np.float32(G))
    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(x, jnp.float32), gj, nu=NU)
    got2 = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    report("A2 traced gamma vs gamma=1.1 ref", got2, ref_K, ref_t)
    g32 = np.float64(np.float32(G))
    m_sq = sq64(xt / g32, x / g32)
    m_K, m_t = k64_from_sq(m_sq)
    report("A2 traced gamma vs MATCHED ref  ", got2, m_K, m_t)

    # A3: X-style 512 cols, in-jit scaling from host-float gamma
    wj = [7766, 15179, 3482, 11910]
    cols = np.concatenate([x[j:j + 128] for j in wj], axis=0)
    c_sq = sq64(xt / G, cols / G)
    c_K, c_t = k64_from_sq(c_sq)
    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(cols, jnp.float32), G, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    report("A3 512-col in-jit scaling       ", got, c_K, c_t)

    # A4: full cols, EAGER pairs -> staged production call (stage=entry)
    inv64 = 1.0 / np.float64(G)
    ah, al = host_pairs(xt, inv64)
    bh, bl = host_pairs(x, inv64)
    kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
    oh, ol = staged_call(ah, al, bh, bl, kap, stage="entry")
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    b64 = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
    p_sq = sq64(a64, b64)
    p_K, p_t = k64_from_sq(p_sq)
    report("A4 full-col eager pairs         ", got, p_K, p_t)

    # A5: grid determinism — 32 identical 512-col groups
    reps = N // 512
    ytile = np.tile(x[:512], (reps, 1))
    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(ytile, jnp.float32), G, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    base = got[:, :512]
    worst = 0.0
    for r in range(1, reps):
        worst = max(worst, float(np.max(np.abs(
            got[:, r * 512:(r + 1) * 512] - base))))
    print(f"A5 grid determinism: max |tile_j - tile_0| = {worst:.2e}",
          flush=True)

    # A6: stage dumps at FULL y-extent
    stage_ref = {"acc": p_sq, "t": p_t, "exp": np.exp(-p_t)}
    for stage in ("acc", "t", "exp"):
        oh, ol = staged_call(ah, al, bh, bl, kap, stage=stage)
        got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
        report(f"A6 stage {stage:3s} full-extent     ",
               got, stage_ref[stage], p_t)
    print("R4_ANOMALY_DONE", flush=True)


if __name__ == "__main__":
    main()
