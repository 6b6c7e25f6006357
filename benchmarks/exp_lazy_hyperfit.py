"""Full matrix-free hyperparameter fit at n = 65,536 on ONE v5e chip.

fit_evidence_lazy (log-space Adam on the BBMM evidence gradients) from a
deliberately bad start (gamma 2x off, noise 3x off). Dense hyperopt tops
out at n ≈ 8k on one chip (reverse-mode Cholesky memory); this path is
O(n) memory and one compiled step reused across iterations.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_lazy_hyperfit.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.parallel import fit_evidence_lazy

N, D = 65536, 4
TRUE_GAMMA, TRUE_NOISE = 0.5, 0.1


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(
        (np.sin(3 * np.asarray(x)[:, 0]) + np.cos(2 * np.asarray(x)[:, 1])
         + TRUE_NOISE * rng.standard_normal(N)),
        jnp.float32,
    )

    t0 = time.perf_counter()
    out = fit_evidence_lazy(
        x, y, gamma0=1.0, noise0=0.3, steps=25, lr=0.15, probes=64,
        cg_tol=1e-5, cg_maxiter=300, probe_tol=1e-2, probe_maxiter=60,
        tol=1e-2, final_value=False, verbose=True,
    )
    wall = time.perf_counter() - t0
    print(f"n={N}: fitted gamma {out['gamma']:.4f} noise {out['noise']:.4f} "
          f"in {out['steps_run']} steps, "
          f"{wall:.1f}s total (inc compile)", flush=True)


if __name__ == "__main__":
    main()
