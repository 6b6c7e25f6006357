"""GaussianProcess(precision="double") paths, CPU.

On CPU-x64 the df Gram falls back to an exact f64 (hi, lo) split
(ops/pallas_gram_df.gram_se_df), so these tests check the plumbing and the
refinement algebra at tight tolerances; the on-TPU accuracy numbers live in
benchmarks/accuracy_check.py and benchmarks/exp_var2.py.
"""

import numpy as np
import pytest

from stpy_tpu.models import GaussianProcess


def _setup(n=400, nt=200, d=2, s=0.1, gamma=0.7, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, d))
    y = np.sin(3 * x[:, :1]) + 0.05 * rng.standard_normal((n, 1))
    xt = rng.uniform(-1, 1, (nt, d))
    return x, y, xt


def _f64_reference(x, y, xt, s, gamma):
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-sq / (2 * gamma * gamma))
    sqs = ((xt[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    Ks = np.exp(-sqs / (2 * gamma * gamma))
    A = K + s * s * np.eye(len(x))
    mu = Ks @ np.linalg.solve(A, y)
    W = np.linalg.solve(A, Ks.T)
    var = 1.0 - np.einsum("tn,nt->t", Ks, W)
    return mu, np.sqrt(np.maximum(var, 1e-30))


@pytest.mark.parametrize("var_refine", [0, 2])
def test_double_mode_matches_f64(var_refine):
    x, y, xt = _setup()
    s, gamma = 0.1, 0.7
    gp = GaussianProcess(
        gamma=gamma, s=s, d=2, precision="double", var_refine=var_refine
    )
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)
    mu_ref, std_ref = _f64_reference(x, y, xt, s, gamma)
    mu_err = np.abs(np.asarray(mu) - mu_ref).max() / np.abs(mu_ref).max()
    std_err = np.abs(np.asarray(std).ravel() - std_ref).max() / std_ref.max()
    # CPU-x64 df fallback is exact f64 → both paths must be ~f64-tight
    # (small slack for the fit's fixed jitter)
    assert mu_err < 1e-6
    assert std_err < 1e-5


def test_var_refine_requires_double():
    with pytest.raises(ValueError):
        GaussianProcess(d=1, var_refine=1)


def test_double_mode_rejects_composite_kernels():
    from stpy_tpu.kernels import KernelFunction

    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    k2 = KernelFunction(kernel_name="linear", d=1)
    gp = GaussianProcess(kernel=k + k2, precision="double")
    x, y, _ = _setup(n=32, nt=8, d=1)
    with pytest.raises(NotImplementedError):
        gp.fit_gp(x[:, :1], y)
