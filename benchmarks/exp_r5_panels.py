"""Round-5 TPU batch — publish the 32k panels tier properly (VERDICT r5
task 8): WARM fit+predict walls at p=1 on the real chip, posterior
PARITY against the single-chip dense 32k path (the r4 entry had one
inc-compile wall and a train-interpolation number only), and the max-n
extrapolation re-stated from the measured 2.16·n²/p.

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_panels.py
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
# D=8, the geometry of every accuracy table in RESULTS.md: in d=2 a 32k
# training set is dense enough that posterior sd sits on the f32
# kss − Σv² cancellation floor and BOTH tiers return rounding noise (the
# first run's "sd rel 4.3e-1" measured that floor, not the panels tier)
D = 8


def force(*xs):
    for x in xs:
        float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.parallel import DistributedExactGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, :1])), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (512, D)), jnp.float32)

    # single-chip dense path — the parity reference and the wall to beat
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    gp = GaussianProcess(kernel=k, s=0.1, jitter_ladder=False)
    t0 = time.perf_counter()
    mu_d, sd_d = gp.fit_predict(x, y, xt)
    force(sd_d)
    cold_d = time.perf_counter() - t0
    walls_d = []
    for _ in range(3):
        t0 = time.perf_counter()
        mu_d, sd_d = gp.fit_predict(x, y, xt)
        force(sd_d)
        walls_d.append(time.perf_counter() - t0)
    print(f"dense single-chip n={N}: warm fit+predict "
          f"{np.median(walls_d):.3f}s (cold {cold_d:.1f}s)", flush=True)
    mu_d, sd_d = np.asarray(mu_d), np.asarray(sd_d)
    del gp  # release the dense factor before the panels run

    # panels p=1 on the real chip
    k2 = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    pg = DistributedExactGP(k2, s=0.1, mesh=mesh, nb=2048,
                            factorization="panels")
    t0 = time.perf_counter()
    pg.fit_gp(x, y)
    mu_p, sd_p = pg.mean_std(xt)
    force(sd_p)
    cold_p = time.perf_counter() - t0
    walls_p = []
    for _ in range(3):
        t0 = time.perf_counter()
        pg.fit_gp(x, y)
        mu_p, sd_p = pg.mean_std(xt)
        force(sd_p)
        walls_p.append(time.perf_counter() - t0)
    mu_p, sd_p = np.asarray(mu_p), np.asarray(sd_p)
    dmu = np.max(np.abs(mu_p - mu_d)) / max(np.max(np.abs(mu_d)), 1e-12)
    dsd = np.max(np.abs(sd_p - sd_d)) / max(np.max(np.abs(sd_d)), 1e-12)
    print(f"panels p=1 n={N}: warm fit+predict {np.median(walls_p):.3f}s "
          f"(cold {cold_p:.1f}s) | parity vs dense: mu rel {dmu:.2e}, "
          f"sd rel {dsd:.2e}", flush=True)

    # max-n extrapolation from the measured 2.16 n^2/p factor (f32, 16 GB)
    for p in (1, 8):
        nmax = int(np.sqrt(15.5e9 * p / (2.16 * 4)))
        print(f"extrapolated dense-capacity n at p={p} chips "
              f"(2.16 n^2/p bytes x4 <= 15.5 GB/chip): ~{nmax:,}",
              flush=True)
    print("R5_PANELS_DONE", flush=True)


if __name__ == "__main__":
    main()
