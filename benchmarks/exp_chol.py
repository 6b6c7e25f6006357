"""Round-2 experiment: can we beat XLA's Cholesky at n=16k?

Calibrated ceilings (benchmarks/exp_roofline.py, GEMM convention 2mnk):
DEFAULT/bf16 202 TFLOP/s, HIGH (bf16x3) 63, HIGHEST (bf16x6) 31. A
HIGH-quality factor therefore floors at ~46 ms for the 2n³/3 GEMM work.
XLA's cholesky: ~64 ms net. Candidates here:

  rl(nb, prec): right-looking block factorization unrolled at trace time —
      static shrinking trailing blocks, ONE final assembly concat, panel
      solves as inverse-GEMMs.
  rl_syrk2(nb): same, but the trailing update W@W.T is computed as a
      2-GEMM split-bf16 symmetric update: with W = hi + lo (bf16 parts),
      W@W.T = hi@hi.T + C + C.T where C = hi@lo.T — identical term set to
      bf16x3 HIGH (which also drops lo@lo) at 2/3 the GEMM cost, because
      the lo@hi.T term is the transpose of C. Panels stay at HIGH.
"""

import numpy as np

import jax
import jax.numpy as jnp

from stpy_tpu.utils.metrics import time_jitted

N = 16384
HIGH = jax.lax.Precision.HIGH
HI = jax.lax.Precision.HIGHEST


def chol_right_looking(A, nb=2048, precision=HIGH):
    n = A.shape[0]
    k = n // nb
    cols = []
    T = A
    for j in range(k):
        Ljj = jnp.linalg.cholesky(T[:nb, :nb])
        eye = jnp.eye(nb, dtype=A.dtype)
        Linv = jax.scipy.linalg.solve_triangular(Ljj, eye, lower=True)
        if j < k - 1:
            B = T[nb:, :nb]                                   # (m, nb)
            Wt = jax.lax.dot(Linv, B.T, precision=precision)  # (nb, m)
            col = jnp.concatenate([Ljj, Wt.T], axis=0)
            T = T[nb:, nb:] - jax.lax.dot(Wt.T, Wt, precision=precision)
        else:
            col = Ljj
        cols.append(jnp.pad(col, ((j * nb, 0), (0, 0))))
    return jnp.concatenate(cols, axis=1)


def _split_bf16(W):
    hi = W.astype(jnp.bfloat16)
    lo = (W - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def syrk2(W):
    """W @ W.T for f32 W via 2 bf16 GEMMs, bf16x3-equivalent accuracy."""
    hi, lo = _split_bf16(W)
    P = jax.lax.dot(hi, hi.T, preferred_element_type=jnp.float32)
    C = jax.lax.dot(hi, lo.T, preferred_element_type=jnp.float32)
    return P + C + C.T


def chol_rl_syrk2(A, nb=2048, panel_precision=HIGH):
    n = A.shape[0]
    k = n // nb
    cols = []
    T = A
    for j in range(k):
        Ljj = jnp.linalg.cholesky(T[:nb, :nb])
        eye = jnp.eye(nb, dtype=A.dtype)
        Linv = jax.scipy.linalg.solve_triangular(Ljj, eye, lower=True)
        if j < k - 1:
            B = T[nb:, :nb]                                         # (m, nb)
            W = jax.lax.dot(B, Linv.T, precision=panel_precision)   # (m, nb)
            col = jnp.concatenate([Ljj, W], axis=0)
            T = T[nb:, nb:] - syrk2(W)
        else:
            col = Ljj
        cols.append(jnp.pad(col, ((j * nb, 0), (0, 0))))
    return jnp.concatenate(cols, axis=1)


def main():
    rng = np.random.default_rng(0)
    G = rng.standard_normal((N, 64)).astype(np.float32)
    K = G @ G.T + N * np.eye(N, dtype=np.float32)
    A = jnp.asarray(K)
    # f64 reference factor residual for accuracy scoring
    scale = float(np.abs(K).max())

    flops = N**3 / 3

    def acc(L):
        L_ = np.asarray(L, np.float64)
        R = L_ @ L_.T - K.astype(np.float64)
        return np.abs(np.tril(R)).max() / scale

    cands = [
        ("rl_syrk2 nb=2048", jax.jit(lambda A: chol_rl_syrk2(A, 2048))),
        ("rl_syrk2 nb=1024", jax.jit(lambda A: chol_rl_syrk2(A, 1024))),
        ("rl_syrk2 nb=4096", jax.jit(lambda A: chol_rl_syrk2(A, 4096))),
        ("rl nb=1024 HIGH", jax.jit(lambda A: chol_right_looking(A, 1024, HIGH))),
    ]
    for tag, f in cands:
        ct, rt = time_jitted(f, A, reps=5)
        a = acc(f(A))
        print(f"{tag:22s} {rt*1e3:7.1f} ms ({(rt-0.031)*1e3:6.1f} net) "
              f"{flops/(rt-0.031)/1e12:5.1f} TF  resid {a:.1e} "
              f"(compile {ct:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
