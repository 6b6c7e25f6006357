"""Round-3 TPU batch K — why does the QR-Nyström PCG converge at ranks
512 (65 iters) and 4096 (25 iters) but stall at rank 2048 (batch H2)?

Probes, per rank, on the exact H configuration: orthonormality of the
QR's Q (max |QᵀQ − I|), orthonormality of the RRᵀ eigenvector matrix V,
the resulting U = Q·V orthonormality, and the eigenvalue range.

Run on the TPU host: timeout 3600 python benchmarks/exp_r3_batch_k.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, S = 65536, 3, 0.2


def main():
    from stpy_tpu.kernels import KernelFunction

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=D)
         + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=D))

    for r in (512, 2048, 4096):
        idx = jax.random.choice(jax.random.fold_in(jax.random.PRNGKey(0), 7),
                                N, (r,), replace=False)
        C = k.eval_params(k.params_dict, x, x[idx])
        Wm = C[idx]
        lw, Qw = jnp.linalg.eigh(Wm)
        lw = jnp.maximum(lw, 1e-5 * jnp.maximum(lw[-1], 1e-30))
        B = C @ (Qw * jax.lax.rsqrt(lw)[None, :])
        Qn, R = jnp.linalg.qr(B)
        qtq = jnp.abs(Qn.T @ Qn - jnp.eye(r, dtype=jnp.float32))
        lam, V = jnp.linalg.eigh(R @ R.T)
        vtv = jnp.abs(V.T @ V - jnp.eye(r, dtype=jnp.float32))
        U = Qn @ V
        utu = jnp.abs(U.T @ U - jnp.eye(r, dtype=jnp.float32))
        print(f"K rank={r}: |QtQ-I| {float(jnp.max(qtq)):.2e}  "
              f"|VtV-I| {float(jnp.max(vtv)):.2e}  "
              f"|UtU-I| {float(jnp.max(utu)):.2e}  "
              f"lam [{float(lam[0]):.3e} .. {float(lam[-1]):.3e}]",
              flush=True)


if __name__ == "__main__":
    main()
