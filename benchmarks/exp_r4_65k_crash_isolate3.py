"""Round-4 TPU probe, phase 3 — bisect the 65k block-CG worker crash.

Phase 2 (exp_r4_65k_crash_isolate2.py): 30-iteration preconditioned
block CG passes; maxiter=500 kills the worker. The fit's own 500-iter
single-RHS cg_solve (~100 s program) survives, so wall-clock alone is
not the trigger. Discriminate:

  a. 500 EAGER matmat calls (readback every 50) — per-invocation kernel
     flakiness, no while_loop;
  b. unpreconditioned 500-iter block CG — preconditioner in/out;
  c. preconditioned block CG at rising maxiter 100/200/350 — find the
     cliff.

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_65k_crash_isolate3.py
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
    from stpy_tpu.parallel.iterative import (cg_solve_block,
                                             rayleigh_nystrom_precond)
    from stpy_tpu.parallel.lazy_kernel import (atom_params, fast_atoms,
                                               make_sum_matmat)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=D))
    atoms = fast_atoms(k)
    gk = [atom_params(k, a) for a in atoms]
    gs, ks = [g for g, _ in gk], [kk for _, kk in gk]
    mm = make_sum_matmat(x, atoms, gs, ks, noise=S)

    def eager_500():
        W = V
        for i in range(500):
            W = mm(W)
            W = W / jnp.maximum(jnp.linalg.norm(W), 1e-30)
            if (i + 1) % 50 == 0:
                _ = float(jnp.sum(W))
                print(f"  eager matmat {i + 1}/500", flush=True)
        return jnp.sum(W)

    stage("a: 500 eager matmats", eager_500)

    stage("b: block CG 500, NO precond",
          lambda: jnp.sum(cg_solve_block(mm, V, M_inv=None, tol=1e-30,
                                         maxiter=500,
                                         stall_window=None)[0]))

    idx = jax.random.choice(jax.random.fold_in(jax.random.PRNGKey(0), 7),
                            N, (512,), replace=False)
    C = k.eval_params(k.params_dict, x, x[idx])
    M_inv = rayleigh_nystrom_precond(C, mm, S)
    for mx in (100, 200, 350):
        stage(f"c: block CG {mx}, preconditioned",
              lambda mx=mx: jnp.sum(
                  cg_solve_block(mm, V, M_inv=M_inv, tol=1e-30,
                                 maxiter=mx, stall_window=None)[0]))
    print("R4_65K_ISOLATE3_DONE", flush=True)


if __name__ == "__main__":
    main()
