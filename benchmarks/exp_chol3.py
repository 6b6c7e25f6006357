"""Round-2 Cholesky experiment 3: Pallas lower-triangle-only syrk trailing
update (ops/pallas_syrk.py) vs the best XLA-level candidates measured in
exp_chol.py (XLA cholesky 73.4 ms net; trace-time right-looking HIGH
nb=2048 63.0 ms net). The kernel halves trailing-update MXU work by
computing only i >= j tiles, which no dense-GEMM (XLA) formulation can do.
"""

import numpy as np

import jax
import jax.numpy as jnp

from stpy_tpu.ops.pallas_syrk import chol_blocked_syrk, syrk_update_lower
from stpy_tpu.utils.metrics import time_jitted

N = 16384


def main():
    rng = np.random.default_rng(0)
    G = rng.standard_normal((N, 64)).astype(np.float32)
    K = G @ G.T + N * np.eye(N, dtype=np.float32)
    A = jnp.asarray(K)
    scale = float(np.abs(K).max())
    flops = N**3 / 3

    def acc(L):
        L_ = np.asarray(L, np.float64)
        R = L_ @ L_.T - K.astype(np.float64)
        return np.abs(np.tril(R)).max() / scale

    # raw kernel roofline probe: one big lower-syrk update
    m, nb = 14336, 2048
    T = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((m, nb)).astype(np.float32))
    for blk in (512,):
        f = jax.jit(lambda T, W, b=blk: syrk_update_lower(T, W, block=b))
        ct, rt = time_jitted(f, T, W, reps=5)
        # useful MACs: m*(m+block)/2*nb ≈ m²/2·nb
        tf = (m * m * nb) / (rt - 0.031) / 1e12
        print(f"syrk_lower m=14336 blk={blk:4d} {rt*1e3:7.1f} ms "
              f"({(rt-0.031)*1e3:6.1f} net)  {tf:5.1f} TF f32-equiv "
              f"(compile {ct:.0f}s)", flush=True)

    cands = [
        ("pallas nb=2048 blk=512",
         jax.jit(lambda A: chol_blocked_syrk(A, 2048, 512))),
        ("pallas nb=1024 blk=512",
         jax.jit(lambda A: chol_blocked_syrk(A, 1024, 512))),
        ("pallas nb=4096 blk=512",
         jax.jit(lambda A: chol_blocked_syrk(A, 4096, 512))),
    ]
    for tag, f in cands:
        ct, rt = time_jitted(f, A, reps=5)
        a = acc(f(A))
        print(f"{tag:24s} {rt*1e3:7.1f} ms ({(rt-0.031)*1e3:6.1f} net) "
              f"{flops/(rt-0.031)/1e12:5.1f} TF  resid {a:.1e} "
              f"(compile {ct:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
