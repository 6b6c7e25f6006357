"""Round-4 CPU batch — SGCP band calibration across seeds (VERDICT r3
task 7).

Measures empirical coverage of the nominal 0.80 HMC-corrected band
(rate_bands_mcmc) and the MFVI band (rate_bands_exact) on the known
sigmoidal-Cox fixture across ≥8 independent realizations. Done-bar:
HMC coverage mean 0.8 ± 0.05; the test bar rises to ≥0.7 multi-seed.

Tunables swept when the default run misses: HMC step size / leapfrog /
warmup, and the residual-variance treatment.

CPU-only (forces the cpu platform before any jax op) — safe to run
alongside a TPU job. Run: timeout 7200 python benchmarks/exp_r4_sgcp_cal.py
"""

import os
import sys

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


def one_seed(seed, hmc_kwargs):
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

    lo, hi = sg.rate_bands_exact(xt, delta=0.1)
    cov_vi = np.mean((true >= np.asarray(lo).ravel() - 1e-6)
                     & (true <= np.asarray(hi).ravel() + 1e-6))

    lo_m, hi_m, acc = sg.rate_bands_mcmc(
        xt, delta=0.1, key=jax.random.PRNGKey(100 + seed), **hmc_kwargs)
    cov_m = np.mean((true >= np.asarray(lo_m).ravel() - 1e-6)
                    & (true <= np.asarray(hi_m).ravel() + 1e-6))
    return cov_vi, cov_m, acc


def sweep(tag, hmc_kwargs):
    rows = [one_seed(s, hmc_kwargs) for s in SEEDS]
    rows = [r for r in rows if r is not None]
    cv = np.array([r[0] for r in rows])
    cm = np.array([r[1] for r in rows])
    ac = np.array([r[2] for r in rows])
    print(f"{tag}: MFVI cov {cv.mean():.3f}±{cv.std():.3f} "
          f"| HMC cov {cm.mean():.3f}±{cm.std():.3f} "
          f"(per-seed {np.round(cm, 2)}) | accept {ac.mean():.2f}",
          flush=True)
    return cm.mean()


def main():
    base = dict(samples=600, warmup=300, step_size=0.05, leapfrog_steps=25)
    m = sweep("default           ", base)
    if not (0.75 <= m <= 0.85):
        sweep("longer chain      ", dict(samples=1500, warmup=600,
                                         step_size=0.05, leapfrog_steps=25))
        sweep("smaller steps     ", dict(samples=1500, warmup=600,
                                         step_size=0.025,
                                         leapfrog_steps=50))
        sweep("larger steps      ", dict(samples=1500, warmup=600,
                                         step_size=0.09, leapfrog_steps=15))
    print("R4_SGCP_CAL_DONE", flush=True)


if __name__ == "__main__":
    main()
