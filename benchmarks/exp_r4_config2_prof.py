"""Round-4 TPU batch — per-stage walls for BASELINE config 2 (the
Hermite-QFF KernelizedFeatures fit+predict+sample at n=512, m=484).

run_all.py measures the whole run() at ~1.9 s warm while the same warm
path takes ~0.1 s on CPU — through the ~31 ms/dispatch tunnel that gap
is ~60 eager dispatches hiding somewhere. Times fit_gp / mean_std /
sample separately (sync'd by scalar readback, utils/metrics.time_jitted
convention) to localize, then counts the big one down by stage.

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_config2_prof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from stpy_tpu.embeddings import HermiteEmbedding
    from stpy_tpu.models import KernelizedFeatures

    rng = np.random.default_rng(1)
    n = 512
    x = rng.uniform(-1, 1, (n, 2))
    y = np.sin(3 * x[:, :1]) * np.cos(2 * x[:, 1:])
    xt = rng.uniform(-1, 1, (1024, 2))

    emb = HermiteEmbedding(gamma=0.5, m=512, d=2)
    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.05, d=2)

    def run():
        F.fit_gp(x, y)
        mu, std = F.mean_std(xt)
        f = F.sample(xt, size=64, key=jax.random.PRNGKey(0))
        return mu, std, f

    t0 = time.perf_counter()
    run()
    print(f"cold run(): {time.perf_counter() - t0:.1f}s (compile)",
          flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        F.fit_gp(x, y)
        # fit_gp leaves device values; force through the tunnel
        float(jnp.sum(F.invV))
        t1 = time.perf_counter()
        mu, std = F.mean_std(xt)
        float(jnp.sum(mu) + jnp.sum(std))
        t2 = time.perf_counter()
        f = F.sample(xt, size=64, key=jax.random.PRNGKey(0))
        float(jnp.sum(f))
        t3 = time.perf_counter()
        print(f"rep{rep}: fit {t1 - t0:.3f}s  mean_std {t2 - t1:.3f}s  "
              f"sample {t3 - t2:.3f}s  total {t3 - t0:.3f}s", flush=True)

    # sub-stage of the worst offender candidates: raw jitted-call floor
    g = jax.jit(lambda a: jnp.sum(a * a))
    v = jnp.ones((512, 484), jnp.float32)
    float(g(v))
    t0 = time.perf_counter()
    for _ in range(5):
        float(g(v))
    print(f"dispatch floor (tiny jit + scalar readback): "
          f"{(time.perf_counter() - t0) / 5 * 1e3:.1f} ms", flush=True)
    print("R4_CONFIG2_PROF_DONE", flush=True)


if __name__ == "__main__":
    main()
