"""Round-4 TPU probe — localize the 65k mean_std worker crash.

The r4 queue's exp_r4_65k_var.py run died with "TPU worker process
crashed or restarted ... kernel fault" inside mean_std(t=1024) on the
n=65,536 sum-kernel lazy tier. This probe runs each stage of that path
in isolation with a scalar readback after every dispatch, in crash-
forward order (cheapest first), so the log's last line names the
faulting stage.

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_65k_crash_isolate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, S, T = 65536, 8, 0.2, 1024


def stage(name, fn):
    t0 = time.perf_counter()
    v = float(fn())
    print(f"stage {name}: ok ({time.perf_counter() - t0:.1f}s, "
          f"readback {v:.3e})", flush=True)


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.ops.pallas_gram_matvec import (gram_matvec,
                                                 make_lazy_matmat)
    from stpy_tpu.parallel.lazy_kernel import (atom_params, fast_atoms,
                                               make_sum_matmat)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=D))

    stage("matvec se (fit-path sanity)",
          lambda: jnp.sum(gram_matvec(x, x, v, family="se", gamma=0.5)))
    stage("cross (1024, 65536)",
          lambda: jnp.sum(k.cross(xt, x)))
    stage("diag(xt)", lambda: jnp.sum(k.diag(xt)))

    atoms = fast_atoms(k)
    gk = [atom_params(k, a) for a in atoms]
    gs, ks = [g for g, _ in gk], [kk for _, kk in gk]
    mm = make_sum_matmat(x, atoms, gs, ks, noise=S)
    stage("sum matmat 128-RHS (the block-CG product)",
          lambda: jnp.sum(mm(V)))

    # single-atom matmat at 65k for comparison
    mm_se = make_lazy_matmat(x, family="se", gamma=0.5, noise=S)
    stage("se matmat 128-RHS", lambda: jnp.sum(mm_se(V)))

    # ~40 chained matmats (a realistic block-CG iteration count) to
    # catch faults that need sustained pressure rather than one call
    def chain(W):
        for _ in range(40):
            W = mm(W) * (1.0 / N)
        return jnp.sum(W)
    stage("40 chained sum matmats", lambda: chain(V))

    print("R4_65K_ISOLATE_DONE", flush=True)


if __name__ == "__main__":
    main()
