"""Measure the ACTUAL reference (torch f64, CPU) on the bench.py workload.

The reference publishes no performance numbers (BASELINE.md), so this
records one on this very host: `stpy.continuous_processes.gauss_procc.
GaussianProcess` fit_gp + mean_std at n=16,384 / 16,384 test points / d=8
SE(gamma=0.5), s=0.1 — the identical problem bench.py times on one v5e
chip. The reference's heavy solver deps are stubbed exactly as in
tests/test_reference_parity.py (the timed path — Gram, LU factor/solve,
chunked mean_std with the per-point diagonal loop, gauss_procc.py:136-399
— never touches them).

CPU-only (never imports jax); safe to run alongside a TPU job.

Run: timeout 3600 python benchmarks/exp_reference_wall.py
"""

import sys
import time
import types
import warnings

import numpy as np

REF = "/root/reference"


def _install_stubs():
    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class _Any:
        def __init__(self, *a, **k):
            pass

    stub("cvxpy", Variable=_Any, Minimize=_Any, Problem=_Any, MOSEK=None)
    stub("cvxpylayers")
    stub("cvxpylayers.torch", CvxpyLayer=_Any)
    stub("pymanopt", Problem=_Any)
    stub("pymanopt.manifolds", Euclidean=_Any, Stiefel=_Any,
         PSDFixedRank=_Any, Product=_Any, Rotations=_Any)
    stub("pymanopt.optimizers", SteepestDescent=_Any)
    stub("pymanopt.solvers", ConjugateGradient=_Any)
    stub("mosek")
    stub("quadprog", solve_qp=_Any)
    stub("hamiltorch")
    stub("torchmin", minimize=_Any)
    stub("autograd_minimize", minimize=_Any)


def main(n=16384, t=16384, d=8, s=0.1):
    import torch

    torch.set_default_dtype(torch.float64)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_stubs()
    warnings.filterwarnings("ignore")

    from stpy.continuous_processes.gauss_procc import GaussianProcess
    from stpy.kernels import KernelFunction

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.uniform(-1, 1, (n, d)))
    y = torch.sin(3 * x[:, :1]) + 0.1 * torch.from_numpy(
        rng.standard_normal((n, 1)))
    xt = torch.from_numpy(rng.uniform(-1, 1, (t, d)))

    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
    gp = GaussianProcess(kernel=k, s=s, d=d)
    # give the reference its FASTER no-grad path (LU factor/solve,
    # gauss_procc.py:367-378) rather than the default lstsq-under-autograd
    gp.back_prop = False

    print(f"torch threads: {torch.get_num_threads()}", flush=True)
    t0 = time.perf_counter()
    gp.fit_gp(x, y)
    t_fit = time.perf_counter() - t0
    print(f"reference fit_gp   n={n}: {t_fit:8.2f} s", flush=True)

    t0 = time.perf_counter()
    mu, std = gp.mean_std(xt)
    t_pred = time.perf_counter() - t0
    print(f"reference mean_std t={t}: {t_pred:8.2f} s", flush=True)
    print(f"reference TOTAL fit+predict: {t_fit + t_pred:8.2f} s", flush=True)
    print(f"sanity: mu range [{float(mu.min()):.3f}, {float(mu.max()):.3f}], "
          f"std med {float(std.median()):.4f}", flush=True)
    print("REFWALL_DONE", flush=True)


if __name__ == "__main__":
    main()
