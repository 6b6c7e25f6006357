"""Round-3 TPU batch S — localize the residual matern df entry error.

After the constant-split fix, the ISOLATED entry math lands at 2.8e-10
absolute (batch P4, exact df sq inputs), but the REAL matern52 Gram at
γ=1.1 still measures 1.8e-8 worst-case (batch I6). The delta must enter
through what P4 bypasses: the 1/γ df coordinate scaling (γ=1.1 has a
nonzero lo limb — the clean se measurement at γ=0.5 scales EXACTLY) or
the d-loop df distance accumulation.

  S1. real I1 data (d=8, γ=1.1, ν=2.5), sq computed in f64 on host and
      fed as exact df pairs through the stage kernel — isolates the
      entry math on the true sq distribution.
  S2. gram_matern_df with γ=1 on HOST-prescaled f32 coords (x/1.1
      rounded to f32; the reference uses the same rounded coords) —
      scaling limbs exactly zero, the d-loop still runs.
  S3. gram_matern_df at γ=1.1 on the same data — the full path
      (batch I6 repeat at this sample size).

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_s.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from exp_r3_batch_p import run_stage

N, T, D, G, NU = 16384, 512, 8, 1.1, 2.5


def k64(sq):
    t = np.sqrt(2.0 * NU * sq)
    return (1.0 + t + t * t / 3.0) * np.exp(-t)


def sq64(a, b):
    na = (a * a).sum(1)
    nb = (b * b).sum(1)
    s = na[:, None] + nb[None, :] - 2.0 * (a @ b.T)
    np.maximum(s, 0.0, out=s)
    return s


def main():
    from stpy_tpu.ops.pallas_gram_df import gram_matern_df

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    xt = rng.uniform(-1, 1, (T, D)).astype(np.float32).astype(np.float64)

    # S1: exact df sq of the real (γ-scaled) geometry through the kernel,
    # chunked to the (512, 128) VMEM-resident shape of batch P
    sq = sq64(xt / G, x / G)                      # (T, N) f64
    m = (sq.size // 128) * 128
    sqf = sq.reshape(-1)[:m].reshape(-1, 128)
    worst = 0.0
    for r0 in range(0, sqf.shape[0], 512):
        blk = sqf[r0:r0 + 512]
        if blk.shape[0] < 512:
            blk = np.pad(blk, ((0, 512 - blk.shape[0]), (0, 0)))
        sqh = np.asarray(blk, np.float32)
        sql = np.asarray(blk - sqh.astype(np.float64), np.float32)
        oh, ol = run_stage(jnp.asarray(sqh), jnp.asarray(sql), nu=NU,
                           stage="entry")
        got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
        ref = k64(sqh.astype(np.float64) + sql.astype(np.float64))
        worst = max(worst, float(np.max(np.abs(got - ref))))
    print(f"S1 entry-from-exact-sq abs err: max {worst:.2e}", flush=True)

    # S2: γ=1 on prescaled f32 coords — zero scaling limbs
    xs = (x / G).astype(np.float32)
    xts = (xt / G).astype(np.float32)
    Kh, Kl = gram_matern_df(jnp.asarray(xts), jnp.asarray(xs), 1.0, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    ref = k64(sq64(xts.astype(np.float64), xs.astype(np.float64)))
    print(f"S2 gram gamma=1 prescaled abs err: max {np.max(np.abs(got - ref)):.2e}",
          flush=True)

    # S3: the full path at γ=1.1 (I6 repeat)
    Kh, Kl = gram_matern_df(jnp.asarray(xt, jnp.float32),
                            jnp.asarray(x, jnp.float32), G, nu=NU)
    got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
    ref = k64(sq64(xt / G, x / G))
    print(f"S3 gram gamma=1.1 full-path abs err: max {np.max(np.abs(got - ref)):.2e}",
          flush=True)
    print("BATCHS_DONE", flush=True)


if __name__ == "__main__":
    main()
