"""Round-4 TPU batch — the real-chip p=1 n=32k panels run (VERDICT r3
task 6 done-bar: the run that OOM'd twice in r3 must pass after the
in-place strip-held factorization cut explicit state ~3n² → 2.16 n²/p).

At n=32k f32: 2.16·n² = 9.3 GB of 15.5 GB HBM — fits; the r3 state
(~3n² = 12.9 GB + workspace) did not (measured OOM twice,
RESULTS.md:353-358).

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_32k_panels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

N = 32768


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import DistributedExactGP

    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    gp = DistributedExactGP(k, s=0.1, mesh=mesh, nb=2048,
                            factorization="panels")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, 2)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, :1])), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (512, 2)), jnp.float32)

    t0 = time.perf_counter()
    gp.fit_gp(x, y)
    mu, sd = gp.mean_std(xt)
    mu = np.asarray(mu)
    sd = np.asarray(sd)
    wall = time.perf_counter() - t0
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(sd))
    # sanity vs a small exact GP on a subsample? full f64 at 32k is hours —
    # assert the posterior interpolates: mean at 512 training points
    mu_tr, _ = gp.mean_std(x[:512])
    err = float(jnp.max(jnp.abs(mu_tr - y[:512])))
    print(f"n={N} p=1 panels: fit+predict {wall:.1f}s (inc compile), "
          f"train-point max |mu - y| = {err:.3e}", flush=True)
    print("R4_32K_PANELS_DONE", flush=True)


if __name__ == "__main__":
    main()
