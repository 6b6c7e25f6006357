"""Measure the ACTUAL reference (torch f64, CPU) on all five BASELINE
configs (VERDICT r3 task 3) — the rebuild's run_all.py workloads, on the
reference's own entry points:

  1. exact-GP n=1024 evidence hyperfit, 8 restarts
       -> stpy.estimator.optimize_params_general 'pytorch-minimize' branch
          (estimator.py:141-223) via GaussianProcess.optimize_params
  2. 2-D Hermite-QFF feature GP, posterior mean/std + 64 samples
       -> stpy.continuous_processes.fourier_fea.GaussianProcessFF:95-148
  3. Nystrom ridge n=50k, additive+Matern kernel, uniform landmarks m=512
       -> stpy.continuous_processes.nystrom_fea.NystromFeatures:46-120
  4. 2-D Poisson positive-basis MAP on Borel sensing data
       -> stpy.point_processes.poisson_rate_estimator.penalized_likelihood_fast
          (poisson_rate_estimator.py:928-1041)
  5. Cox-surrogate bandwidth hyperfit, 64 restarts (n=256)
       -> same optimize_params driver as config 1 (mkl_estimator.py's Cox
          hyperfit drives the identical evidence objective)

Solver-stub discipline (same as exp_reference_wall.py / the parity tests):
deps that are ABSENT from this environment are stubbed, but the two the
timed paths actually call — torchmin.minimize and autograd_minimize.minimize
— get REAL shims backed by scipy L-BFGS(-B) with gradients from torch
autograd, which is exactly what those packages are (scipy-minimize wrappers
over torch autograd). The measured work is the reference's own objective +
gradient evaluations (torch f64 slogdet/solve/Gram), which dominate.
torch 1.x APIs removed in torch 2.13 (torch.solve, torch.cholesky,
torch.symeig) are shimmed onto their torch.linalg equivalents.

CPU-only (never imports jax); safe to run alongside a TPU job.

Run: timeout 7200 python benchmarks/exp_reference_walls5.py
"""

import json
import os
import sys
import time
import types
import warnings

import numpy as np

REF = "/root/reference"


def _install_stubs():
    import torch
    from scipy.optimize import minimize as sp_minimize

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

    class _Euclidean:
        """pymanopt.Euclidean stand-in carrying the .dim the
        'pytorch-minimize' branch reads (estimator.py:146-153)."""

        def __init__(self, n):
            self.dim = int(n)

    class _Res:
        pass

    def torchmin_minimize(cost, x_init, method="l-bfgs", tol=1e-10,
                          disp=0, options=None):
        """Real shim for torchmin.minimize: scipy L-BFGS-B on the torch
        objective with autograd gradients (torchmin IS a torch port of
        scipy's minimize; same algorithm family, same stopping rules)."""
        options = options or {}
        maxiter = int(options.get("max_iter", options.get("maxiter", 100)))
        gtol = float(options.get("gtol", 1e-5))

        def fg(z):
            x = torch.from_numpy(np.asarray(z, np.float64)).requires_grad_()
            f = cost(x)
            f = f.reshape(())
            (g,) = torch.autograd.grad(f, x)
            return float(f.detach()), np.asarray(g.detach(), np.float64)

        r = sp_minimize(fg, np.asarray(x_init.detach(), np.float64).ravel(),
                        jac=True, method="L-BFGS-B", tol=tol,
                        options={"maxiter": maxiter, "gtol": gtol})
        out = _Res()
        out.x = torch.from_numpy(np.asarray(r.x, np.float64))
        out.fun = torch.tensor(float(r.fun), dtype=torch.float64)
        out.message = str(r.message)
        return out

    def autograd_minimize(objective, x0, backend="torch",
                          method="L-BFGS-B", bounds=None, precision=None,
                          tol=1e-8, options=None):
        """Real shim for autograd_minimize.minimize: scipy L-BFGS-B with
        torch autograd gradients and box bounds (what the package does)."""
        options = options or {}
        x0 = np.asarray(x0, np.float64).ravel()

        def fg(z):
            x = torch.from_numpy(np.asarray(z, np.float64)).requires_grad_()
            f = objective(x).reshape(())
            (g,) = torch.autograd.grad(f, x)
            return float(f.detach()), np.asarray(g.detach(), np.float64)

        sp_bounds = None
        if bounds is not None:
            lo, hi = bounds
            lo = np.broadcast_to(np.asarray(lo, np.float64).ravel(), x0.shape)
            hi = np.broadcast_to(np.asarray(hi, np.float64).ravel(), x0.shape)
            sp_bounds = list(zip(lo, hi))
        r = sp_minimize(fg, x0, jac=True, method="L-BFGS-B",
                        bounds=sp_bounds, tol=tol,
                        options={k: options[k] for k in
                                 ("maxiter", "ftol", "gtol", "maxls")
                                 if k in options})
        out = _Res()
        out.x = np.asarray(r.x, np.float64)
        out.fun = float(r.fun)
        out.message = str(r.message)
        return out

    stub("cvxpy", Variable=_Any, Minimize=_Any, Maximize=_Any,
         Problem=_Any, MOSEK=None)
    stub("cvxpylayers")
    stub("cvxpylayers.torch", CvxpyLayer=_Any)
    stub("pymanopt", Problem=_Any)
    stub("pymanopt.manifolds", Euclidean=_Euclidean, Stiefel=_Any,
         PSDFixedRank=_Any, Product=_Any, Rotations=_Any)
    stub("pymanopt.optimizers", SteepestDescent=_Any)
    stub("pymanopt.solvers", ConjugateGradient=_Any)
    stub("mosek", iparam=_Any(), dparam=_Any(), solveform=_Any())
    stub("quadprog", solve_qp=_Any)
    stub("hamiltorch")
    stub("torchmin", minimize=torchmin_minimize)
    stub("autograd_minimize", minimize=autograd_minimize)

    # torch 1.x APIs the reference calls; torch 2.13 keeps the names but
    # they RAISE a removal error, so override unconditionally
    torch.solve = lambda B, A: (torch.linalg.solve(A, B), None)
    torch.cholesky = lambda A, upper=False: (
        torch.linalg.cholesky(A).mH if upper
        else torch.linalg.cholesky(A))

    def _symeig(A, eigenvectors=False, upper=True):
        w, v = torch.linalg.eigh(A)
        return (w, v) if eigenvectors else (w, torch.empty(0))
    torch.symeig = _symeig


def _setup():
    import torch

    torch.set_default_dtype(torch.float64)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_stubs()
    warnings.filterwarnings("ignore")
    return torch


def config1(torch, restarts=8, n=1024, maxiter=40):
    from stpy.continuous_processes.gauss_procc import GaussianProcess
    from stpy.kernels import KernelFunction

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.uniform(-1, 1, (n, 1)))
    y = torch.sin(4 * x) + 0.05 * torch.from_numpy(
        rng.standard_normal((n, 1)))
    k = KernelFunction(kernel_name="squared_exponential", gamma=1.0, d=1)
    gp = GaussianProcess(kernel=k, s=0.05, d=1)
    gp.back_prop = False
    gp.fit_gp(x, y)

    t0 = time.perf_counter()
    gp.optimize_params(type="bandwidth", restarts=restarts,
                       maxiter=maxiter, optimizer="pytorch-minimize",
                       verbose=False)
    wall = time.perf_counter() - t0
    gamma = float(np.ravel(np.asarray(
        gp.kernel_object.params_dict["0"]["gamma"].detach()))[0])
    return {"config": 1, "wall_s": round(wall, 3),
            "fitted_gamma": round(gamma, 4), "restarts": restarts}


def config2(torch):
    from stpy.continuous_processes.fourier_fea import GaussianProcessFF

    rng = np.random.default_rng(1)
    n = 512
    x = torch.from_numpy(rng.uniform(-1, 1, (n, 2)))
    y = torch.sin(3 * x[:, :1]) * torch.cos(2 * x[:, 1:])
    xt = torch.from_numpy(rng.uniform(-1, 1, (1024, 2)))

    F = GaussianProcessFF(gamma=0.5, s=0.05, approx="hermite", m=512, d=2,
                          verbose=False)
    # warm call outside the timed region mirrors run_all.py's compile
    # warm-up (torch has nothing to compile; this just loads caches)
    F.fit_gp(x, y)
    t0 = time.perf_counter()
    F.fit_gp(x, y)
    mu, std = F.mean_std(xt)
    f = F.sample(xt, size=64)
    wall = time.perf_counter() - t0

    # quality vs the reference's OWN exact GP on the same data — the same
    # gate run_all.py applies to the rebuild (mu_err_vs_exact)
    from stpy.continuous_processes.gauss_procc import GaussianProcess
    from stpy.kernels import KernelFunction

    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    gp = GaussianProcess(kernel=k, s=0.05, d=2)
    gp.back_prop = False
    gp.fit_gp(x, y)
    mu_e, std_e = gp.mean_std(xt)
    return {"config": 2, "wall_s": round(wall, 3),
            "basis_size": int(F.m) if np.ndim(F.m) == 0 else
            int(torch.sum(F.m)),
            "mu_err_vs_exact": float(torch.abs(mu - mu_e).max()),
            "std_err_vs_exact": float(torch.abs(std - std_e).max())}


def config3(torch):
    from stpy.continuous_processes.nystrom_fea import NystromFeatures
    from stpy.kernels import KernelFunction

    rng = np.random.default_rng(2)
    n = 50_000
    x = torch.from_numpy(rng.uniform(-1, 1, (n, 2)))
    y = torch.sin(3 * x[:, :1]) + x[:, 1:]
    k = KernelFunction(kernel_name="matern", gamma=0.4, nu=1.5, d=2,
                       group=[0]) + KernelFunction(
        kernel_name="squared_exponential", gamma=0.6, d=2, group=[1])
    np.random.seed(2)  # reference uniform_subsampling uses global np.random
    nf = NystromFeatures(k, m=512, approx="uniform", s=0.05)
    t0 = time.perf_counter()
    nf.fit_gp(x, y)
    mu, std = nf.mean_std(x[:2048])
    wall = time.perf_counter() - t0
    resid = float(torch.mean(torch.abs(mu - y[:2048])))
    return {"config": 3, "wall_s": round(wall, 3),
            "train_mae_head": round(resid, 4)}


def config4(torch):
    from stpy.borel_set import HierarchicalBorelSets as RefHier
    from stpy.kernels import KernelFunction as RefKernel
    from stpy.point_processes.poisson_rate_estimator import (
        PoissonRateEstimator as RefPRE,
    )

    hier = RefHier(2, [[-1.0, 1.0], [-1.0, 1.0]], 3)
    k = RefKernel(kernel_name="squared_exponential", gamma=0.4, d=2)
    est = RefPRE(None, hier, d=2, m=8, kernel_object=k, B=4.0, s=1e-3,
                 basis="triangle", dual=False, opt="torch")

    # IDENTICAL data to run_all.py config 4: the exact Poisson draw the
    # rebuild fits, exported by benchmarks/export_config4_data.py (the
    # first r4 run drew uniform 16-point leaves — a different data law,
    # fitted totals incomparable)
    dpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".config4_data.npz")
    z = np.load(dpath)
    counts, points, dt = z["counts"], z["points"], float(z["dt"])
    data, off = [], 0
    for S, c in zip(hier.get_sets_level(3), counts):
        pts = points[off:off + int(c)]
        off += int(c)
        data.append((S, torch.from_numpy(pts) if len(pts) else None, dt))
    est.load_data(data)

    t0 = time.perf_counter()
    est.fit_gp()
    wall = time.perf_counter() - t0
    D = hier.get_parent_set()
    total = float(est.mean_set(D))
    return {"config": 4, "wall_s": round(wall, 3),
            "fitted_total_rate": round(total, 3)}


def config5(torch):
    """Same DATA LAW as run_all.py config 5 (log-Cox surrogate, seed 4) —
    the first r4 run reused config 1's sin data, so fitted gammas were
    incomparable."""
    from stpy.continuous_processes.gauss_procc import GaussianProcess
    from stpy.kernels import KernelFunction

    rng = np.random.default_rng(4)
    n = 256
    xx = rng.uniform(-1, 1, (n, 1))
    yy = (np.log(2.5 * np.exp(-4 * xx ** 2) + 0.3)
          + 0.05 * rng.standard_normal((n, 1)))
    x, y = torch.from_numpy(xx), torch.from_numpy(yy)
    k = KernelFunction(kernel_name="squared_exponential", gamma=1.0, d=1)
    gp = GaussianProcess(kernel=k, s=0.05, d=1)
    gp.back_prop = False
    gp.fit_gp(x, y)
    t0 = time.perf_counter()
    gp.optimize_params(type="bandwidth", restarts=64, maxiter=40,
                       optimizer="pytorch-minimize", verbose=False)
    wall = time.perf_counter() - t0
    gamma = float(np.ravel(np.asarray(
        gp.kernel_object.params_dict["0"]["gamma"].detach()))[0])
    return {"config": 5, "wall_s": round(wall, 3),
            "fitted_gamma": round(gamma, 4), "restarts": 64}


def main():
    torch = _setup()
    print(f"torch threads: {torch.get_num_threads()}", flush=True)
    only = set(int(a) for a in sys.argv[1:]) or {1, 2, 3, 4, 5}
    for i, fn in enumerate([config1, config2, config3, config4, config5],
                           start=1):
        if i not in only:
            continue
        try:
            res = fn(torch)
        except Exception as e:  # record the failure, keep measuring
            res = {"config": i, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(res), flush=True)
    print("REFWALLS5_DONE", flush=True)


if __name__ == "__main__":
    main()
