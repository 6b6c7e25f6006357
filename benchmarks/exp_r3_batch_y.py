"""Round-3 TPU batch Y — closing the vr=1 ≤0.7 s combined bar.

Two knobs, each measured on the full C1 ladder (se / matern32 /
se+matern52, n=16k, vr=1 only, cached f64 references):

  * `df_refine_steps=1` — batch M/Q measured ir=1 == ir=2 to every
    printed digit; each step costs ~0.08 s of the budget.
  * `qform_precision="bf16x3"` — the fused df quadratic form's main
    product at an emulated HIGH (3 DEFAULT MXU passes on explicit bf16
    splits) instead of HIGHEST (bf16x6). ~3x the MXU rate on the 0.39 s
    dominant term, but the dropped a1·b1 cross term injects FIRST-order
    ~2^-17·|Th|·|W0| noise into q — this run decides whether that noise
    clears the ≤5e-6 var-max gate or destroys the refinement (the way
    the DEFAULT W0 solve did, batch M).

Run on the TPU host: timeout 7200 python benchmarks/exp_r3_batch_y.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_r3_batch_c import acc, force, host_reference, matern64, sq64, timed


def y1_ladder(n=16384, d=8, s=0.1):
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))

    cases = [
        ("se", lambda: KernelFunction(kernel_name="squared_exponential",
                                      gamma=0.5, d=d),
         lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25))),
        ("matern32", lambda: KernelFunction(kernel_name="matern", gamma=0.8,
                                            nu=1.5, d=d),
         lambda a, b: matern64(sq64(a, b), 0.8, 1.5)),
        ("se+matern", lambda: (
            KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
            + KernelFunction(kernel_name="matern", gamma=1.1, nu=2.5, d=d)),
         lambda a, b: (np.exp(-sq64(a, b) / (2 * 0.25))
                       + matern64(sq64(a, b), 1.1, 2.5))),
    ]
    configs = [
        ("ir=1 qf=HIGHEST", dict(df_refine_steps=1)),
        ("ir=1 qf=bf16x3", dict(df_refine_steps=1,
                                qform_precision="bf16x3")),
        ("ir=2 qf=bf16x3", dict(df_refine_steps=2,
                                qform_precision="bf16x3")),
    ]
    for name, mk, k64 in cases:
        mu64, var64 = host_reference(k64, xh, yh, xt, s,
                                     cache=f"c1_{name}_{n}")
        for cname, kw in configs:
            try:
                gp = GaussianProcess(kernel=mk(), s=s, precision="double",
                                     var_refine=1, **kw)
                gp.fit_gp(x, y)
                force(gp.mean_std(xtj))                      # compile
                walls = []
                for _ in range(3):
                    w, (mu, sd) = timed(
                        lambda: (gp.fit_gp(x, y), gp.mean_std(xtj))[-1]
                    )
                    walls.append(w)
                m, vmax, vmed = acc(mu, sd, mu64, var64)
                print(f"{name:10s} {cname:18s} warm {np.median(walls):6.3f}s"
                      f"  mean rel {m:.2e}  var max {vmax:.2e} "
                      f"med {vmed:.2e}", flush=True)
            except Exception:
                traceback.print_exc()


def y2_fused(n=16384, d=8, s=0.1):
    """The single-dispatch fused fit_predict wall for the winning config
    (what bench-style serving sees)."""
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, :1])
    xt = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)

    for cname, kw in [("ir=1 qf=HIGHEST", dict(df_refine_steps=1)),
                      ("ir=1 qf=bf16x3",
                       dict(df_refine_steps=1, qform_precision="bf16x3"))]:
        try:
            k = KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                               d=d)
            gp = GaussianProcess(kernel=k, s=s, precision="double",
                                 var_refine=1, **kw)
            force(gp.fit_predict(x, y, xt))                  # compile
            walls = []
            for _ in range(5):
                w, _ = timed(lambda: gp.fit_predict(x, y, xt))
                walls.append(w)
            print(f"fused fit_predict {cname:18s} "
                  f"warm {np.median(walls):6.3f}s", flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    y1_ladder()
    y2_fused()
    print("BATCHY_DONE", flush=True)
