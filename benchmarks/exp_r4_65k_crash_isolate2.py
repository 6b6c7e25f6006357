"""Round-4 TPU probe, phase 2 — the 65k mean_std crash reproduces with
the full pipeline but not with bare matmat/cross stages (phase 1,
exp_r4_65k_crash_isolate.py). Remaining suspects are the stages phase 1
skipped: the rank-512 Rayleigh preconditioner APPLY, and the block-CG
while_loop holding matmat + M_inv together. Crash-forward order.

Run on the TPU host: timeout 5400 python benchmarks/exp_r4_65k_crash_isolate2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, S = 65536, 8, 0.2


def stage(name, fn):
    t0 = time.perf_counter()
    v = float(fn())
    print(f"stage {name}: ok ({time.perf_counter() - t0:.1f}s, "
          f"readback {v:.3e})", flush=True)


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel.iterative import (cg_solve, cg_solve_block,
                                             rayleigh_nystrom_precond)
    from stpy_tpu.parallel.lazy_kernel import (atom_params, fast_atoms,
                                               make_sum_matmat,
                                               make_sum_matvec)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    yv = jnp.asarray(np.sin(3 * np.asarray(x[:, 0])), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=D))
    atoms = fast_atoms(k)
    gk = [atom_params(k, a) for a in atoms]
    gs, ks = [g for g, _ in gk], [kk for _, kk in gk]
    mm = make_sum_matmat(x, atoms, gs, ks, noise=S)
    mv = make_sum_matvec(x, atoms, gs, ks, noise=S)

    idx = jax.random.choice(jax.random.fold_in(jax.random.PRNGKey(0), 7),
                            N, (512,), replace=False)
    C = k.eval_params(k.params_dict, x, x[idx])
    stage("precond build (rank 512)", lambda: jnp.sum(C))
    M_inv = rayleigh_nystrom_precond(C, mm, S)
    stage("M_inv apply (n,128)", lambda: jnp.sum(M_inv(V)))

    stage("cg_solve 30 iters (fit-path shape)",
          lambda: jnp.sum(cg_solve(mv, yv, M_inv=M_inv, tol=1e-30,
                                   maxiter=30)[0]))
    stage("block CG 30 iters, no precond",
          lambda: jnp.sum(cg_solve_block(mm, V, M_inv=None, tol=1e-30,
                                         maxiter=30)[0]))
    stage("block CG 30 iters, preconditioned",
          lambda: jnp.sum(cg_solve_block(mm, V, M_inv=M_inv, tol=1e-30,
                                         maxiter=30)[0]))
    stage("block CG to maxiter=500, preconditioned",
          lambda: jnp.sum(cg_solve_block(mm, V, M_inv=M_inv, tol=1e-6,
                                         maxiter=500)[0]))
    for i in range(8):
        stage(f"block CG 500 rep {i} (the 8-block mean_std loop)",
              lambda: jnp.sum(cg_solve_block(mm, V, M_inv=M_inv, tol=1e-6,
                                             maxiter=500)[0]))
    print("R4_65K_ISOLATE2_DONE", flush=True)


if __name__ == "__main__":
    main()
