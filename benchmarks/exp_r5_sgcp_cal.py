"""Round-5 CPU batch — SGCP band calibration for ALL THREE tiers
(VERDICT r5 task 7): MFVI (factorized), linear-response corrected
(deterministic, no sampling), and HMC-corrected, over 8 independent
realizations of the sigmoidal-Cox fixture at the nominal 0.80 band.

Done-bar: LR coverage ≥ 0.7 multi-seed mean (closing the 0.547 MFVI gap
without sampling); HMC stays the nominal standard.

CPU-only (forces the cpu platform before any jax op) — safe to run
alongside a TPU job. Run: timeout 7200 python benchmarks/exp_r5_sgcp_cal.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

LAM = 60.0
SEEDS = list(range(8))


def rate_fn(x):
    return LAM * jax.nn.sigmoid(3.0 * jnp.sin(3.0 * x[:, 0]))


def one_seed(seed):
    from stpy_tpu.approx_inference.sgcp import SGCPVariational
    from stpy_tpu.domains import BorelSet
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.point_processes import PoissonPointProcess

    S = BorelSet(1, [[-1.0, 1.0]])
    proc = PoissonPointProcess(d=1, B=LAM, rate=rate_fn)
    obs = proc.sample_discretized(jax.random.PRNGKey(seed), S, dt=1.0,
                                  n=512)
    if obs is None or obs.shape[0] < 20:
        return None
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.35, d=1)
    sg = SGCPVariational(k, S, obs, num_inducing=16, num_integration=128,
                         lam_max_init=LAM)
    sg.run(steps=600)
    xt = jnp.linspace(-0.95, 0.95, 64)[:, None]
    true = np.asarray(rate_fn(xt)).ravel()

    def cov(lo, hi):
        return float(np.mean(
            (true >= np.asarray(lo).ravel() - 1e-6)
            & (true <= np.asarray(hi).ravel() + 1e-6)))

    lo, hi = sg.rate_bands_exact(xt, delta=0.1)
    t0 = time.perf_counter()
    lo_l, hi_l = sg.rate_bands_linear_response(xt, delta=0.1)
    lr_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    lo_m, hi_m, acc = sg.rate_bands_mcmc(
        xt, delta=0.1, key=jax.random.PRNGKey(100 + seed))
    hmc_wall = time.perf_counter() - t0
    return (cov(lo, hi), cov(lo_l, hi_l), cov(lo_m, hi_m), acc,
            lr_wall, hmc_wall)


def main():
    rows = [one_seed(s) for s in SEEDS]
    rows = [r for r in rows if r is not None]
    cv, cl, cm, ac, lw, hw = (np.array([r[i] for r in rows])
                              for i in range(6))
    print(f"MFVI cov {cv.mean():.3f}±{cv.std():.3f} "
          f"(per-seed {np.round(cv, 2)})", flush=True)
    print(f"LR   cov {cl.mean():.3f}±{cl.std():.3f} "
          f"(per-seed {np.round(cl, 2)}) wall {np.median(lw):.1f}s",
          flush=True)
    print(f"HMC  cov {cm.mean():.3f}±{cm.std():.3f} "
          f"(per-seed {np.round(cm, 2)}) accept {ac.mean():.2f} "
          f"wall {np.median(hw):.1f}s", flush=True)
    print("R5_SGCP_CAL_DONE", flush=True)


if __name__ == "__main__":
    main()
