"""Round-5 TPU batch — serving-wall recovery probe (VERDICT r5 task 3).

serving3 measured the r5 mixed-W0 defaults through the real
GaussianProcess at se 1.008 s / matern32 1.021 s / composite 1.142 s —
~70-80 ms over the handrolled pipeline rows (serving2: 0.949 matern32,
1.069 composite). The suspected delta is the fit-side adaptive jitter
LADDER (a while_loop re-running Cholesky; the pipeline uses the fixed
chol_jittered). This measures the same three closing rows with
jitter_ladder=False — the documented serving configuration (CLAUDE.md:
fixed jitter is also REQUIRED for dense 32k fits) — and, if the ladder
is the cost, those are the closing rows for the ≤1.0 s bar.

Usage:  python exp_r5_serving4.py table    — the 3-family closing table
        python exp_r5_serving4.py stages   — composite stage walls
        (separate processes: serving3's stage block OOM'd after 3 GP
        fits' buffers/caches in the same process)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference
from exp_r4_qform_fix import family

N, D, S = 16384, 8, 0.1


def run_fixed(name, reps=5):
    from stpy_tpu.models import GaussianProcess

    mk, k64 = family(name)
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(k64, xh, yh, xt, S, cache=f"c1_{name}_{N}")

    gp = GaussianProcess(kernel=mk(), s=S, precision="double", var_refine=1,
                         jitter_ladder=False)
    gp.fit_gp(x, y)
    mu, sd = gp.mean_std(xtj)
    float(jnp.sum(sd))
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    mrel = (np.abs(np.asarray(mu, np.float64).ravel() - mu64).max()
            / np.abs(mu64).max())
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mu2, sd2 = gp.fit_predict(x, y, xtj)
        float(jnp.sum(sd2))
        walls.append(time.perf_counter() - t0)
    print(f"{name:10s} ladder=False W0=default(mixed) mean rel {mrel:.2e}  "
          f"var max {vrel.max():.2e} med {np.median(vrel):.2e}  "
          f"fused wall {np.median(walls):.3f}s (min {min(walls):.3f})",
          flush=True)
    gp.L = gp.A = gp._A_df = gp._df_train = None
    del gp


def main():
    if "stages" in sys.argv:
        from exp_r5_serving3 import stages_composite_mixed
        stages_composite_mixed()
        print("R5_SERVING4_STAGES_DONE", flush=True)
        return
    run_fixed("se")
    run_fixed("matern32")
    run_fixed("se+matern")
    print("R5_SERVING4_DONE", flush=True)


if __name__ == "__main__":
    main()
