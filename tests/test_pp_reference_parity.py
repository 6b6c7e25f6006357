"""PoissonRateEstimator parity against the ACTUAL reference package
(VERDICT r2 item 5).

Compared on IDENTICAL sensing data at f64: the Γ^{1/2} basis covariance
chain, per-basic-set integrals, bucketization totals, the Bernstein
variance correction, all three uncertainty covariances (Laplace /
regression / bins — reference poisson_rate_estimator.py:1492-1583), and
the weighted-least-squares fit (reference :1136-1215) checked against the
closed-form normal-equation optimum of the reference's own objective built
from the REFERENCE's data model.

The reference's solvers (MOSEK/torchmin) are stubbed out — every compared
path here is pure torch/numpy on their side. The WLS comparison therefore
pins our solver against the analytic optimizer of their objective rather
than their (unrunnable) MOSEK call; with loose box constraints the two
coincide.
"""

import sys
import types
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

torch = pytest.importorskip("torch")

import os  # noqa: E402

if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)


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

    stub("cvxpy", Variable=_Any, Minimize=_Any, Maximize=_Any, Problem=_Any,
         MOSEK=None)
    stub("cvxpylayers")
    stub("cvxpylayers.torch", CvxpyLayer=_Any)
    stub("pymanopt", Problem=_Any)
    stub("pymanopt.manifolds", Euclidean=_Any, Stiefel=_Any,
         PSDFixedRank=_Any, Product=_Any, Rotations=_Any)
    stub("pymanopt.optimizers", SteepestDescent=_Any)
    stub("pymanopt.solvers", ConjugateGradient=_Any)
    stub("mosek", iparam=_Any(), dparam=_Any(), solveform=_Any())
    stub("quadprog", solve_qp=_Any)
    stub("hamiltorch")
    stub("torchmin", minimize=_Any)
    stub("autograd_minimize", minimize=_Any)


if REF not in sys.path:
    sys.path.insert(0, REF)
_install_stubs()
warnings.filterwarnings("ignore", category=SyntaxWarning)
torch.set_default_dtype(torch.float64)

from stpy.borel_set import HierarchicalBorelSets as RefHier  # noqa: E402
from stpy.kernels import KernelFunction as RefKernel  # noqa: E402
from stpy.point_processes.poisson_rate_estimator import (  # noqa: E402
    PoissonRateEstimator as RefPRE,
)

from stpy_tpu.domains import HierarchicalBorelSets  # noqa: E402
from stpy_tpu.kernels import KernelFunction  # noqa: E402
from stpy_tpu.point_processes import PoissonRateEstimator  # noqa: E402

M, LEVELS, GAMMA, B, S_REG, JITTER = 16, 3, 0.4, 4.0, 0.1, 1e-5


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def _bounds_key(bounds):
    return tuple(np.round(np.asarray(bounds, np.float64).ravel(), 12))


@pytest.fixture(scope="module")
def pair():
    """(ref_est, my_est) loaded with identical sensing data."""
    ref_hier = RefHier(1, (-1.0, 1.0), LEVELS)
    my_hier = HierarchicalBorelSets(1, [[-1.0, 1.0]], levels=LEVELS)

    ref_est = RefPRE(
        None, ref_hier, d=1, m=M,
        kernel_object=RefKernel(kernel_name="squared_exponential",
                                gamma=GAMMA, d=1),
        B=B, s=S_REG, jitter=JITTER, b=0.0, basis="triangle", dual=False,
    )
    my_est = PoissonRateEstimator(
        None, my_hier, d=1, m=M,
        kernel_object=KernelFunction(kernel_name="squared_exponential",
                                     gamma=GAMMA, d=1),
        B=B, s=S_REG, jitter=JITTER, b=0.0, basis="triangle", dual=False,
        jit_pad=False,
    )

    # identical sensing rounds: all leaves + two level-2 sets, fixed points
    rng = np.random.default_rng(0)
    ref_leaves = ref_hier.get_sets_level(LEVELS)
    my_leaves = my_hier.get_sets_level(LEVELS)
    my_by_bounds = {_bounds_key(s.bounds): s for s in my_leaves}
    ref_l2 = ref_hier.get_sets_level(LEVELS - 1)
    my_l2 = {_bounds_key(s.bounds): s
             for s in my_hier.get_sets_level(LEVELS - 1)}

    ref_data, my_data = [], []
    # empirical rate ~2 (interior of (0, B=4)) so the WLS box constraints
    # are inactive and the closed-form comparison below is exact
    for i, rs in enumerate(list(ref_leaves) * 2 + ref_l2[:2]):
        b = np.asarray(rs.bounds, np.float64)
        lo, hi = b[0, 0], b[0, 1]
        dt = float(4.0 + 0.5 * i)
        k = max(1, int(rng.poisson(2.0 * (hi - lo) * dt)))
        pts = rng.uniform(lo + 1e-3, hi - 1e-3, (k, 1))
        ms = (my_by_bounds.get(_bounds_key(rs.bounds))
              or my_l2[_bounds_key(rs.bounds)])
        ref_data.append((rs, torch.from_numpy(pts), dt))
        my_data.append((ms, jnp.asarray(pts), dt))
    ref_est.load_data(ref_data)
    my_est.load_data(my_data)
    return ref_est, my_est


def test_gamma_half_matches_reference(pair):
    ref_est, my_est = pair
    Gr = ref_est.cov().numpy()
    Gm = np.asarray(my_est.cov())
    assert Gr.shape == Gm.shape
    assert _rel(Gm, Gr) < 1e-6


def test_varphis_and_variances_match_reference(pair):
    ref_est, my_est = pair
    # identical basic-set ORDER is asserted via bounds, then row-for-row
    rb = [np.asarray(s.bounds, np.float64).ravel()
          for s in ref_est.basic_sets]
    mb = [np.asarray(s.bounds, np.float64).ravel()
          for s in my_est.basic_sets]
    assert np.allclose(np.stack(rb), np.stack(mb))
    assert _rel(np.asarray(my_est.varphis), ref_est.varphis.numpy()) < 1e-8
    assert _rel(np.asarray(my_est.variances),
                ref_est.variances.numpy()) < 1e-12


def test_bucketization_matches_reference(pair):
    ref_est, my_est = pair
    assert np.allclose(np.asarray(my_est.total_bucketized_obs),
                       ref_est.total_bucketized_obs.numpy())
    assert np.allclose(np.asarray(my_est.total_bucketized_time),
                       ref_est.total_bucketized_time.numpy())
    assert np.array_equal(np.asarray(my_est.bucketized_counts),
                          ref_est.bucketized_counts.numpy())


def test_counts_phis_match_reference(pair):
    ref_est, my_est = pair
    assert np.allclose(np.asarray(my_est.counts),
                       ref_est.counts.numpy())
    assert _rel(np.asarray(my_est.phis), ref_est.phis.numpy()) < 1e-8


def test_variance_correction_matches_reference(pair):
    ref_est, my_est = pair
    for v in (0.37, 1.0, 5.0, 42.0):
        kr = ref_est.variance_correction(v)
        km = my_est.variance_correction(v)
        assert km == pytest.approx(float(kr), rel=1e-5), v


def test_laplace_covariance_matches_reference(pair):
    ref_est, my_est = pair
    rng = np.random.default_rng(1)
    theta = rng.uniform(0.5, 1.5, M)
    ref_est.rate = torch.from_numpy(theta.copy())
    my_est.rate = jnp.asarray(theta)
    Wr = ref_est.construct_covariance_matrix_laplace().numpy()
    Wm = np.asarray(my_est.construct_covariance_matrix_laplace())
    assert _rel(Wm, Wr) < 1e-7


def test_regression_covariance_matches_reference(pair):
    ref_est, my_est = pair
    Wr = ref_est.construct_covariance_matrix_regression().numpy()
    Wm = np.asarray(my_est.construct_covariance_matrix_regression())
    assert _rel(Wm, Wr) < 1e-6


def test_bins_covariance_matches_reference(pair):
    ref_est, my_est = pair
    Wr = ref_est.construct_covariance_matrix_bins().numpy()
    Wm = np.asarray(my_est.construct_covariance_matrix_bins())
    assert _rel(Wm, Wr) < 1e-6


def test_wls_fit_matches_reference_objective_optimum(pair):
    """Our least_squares_weighted vs the closed-form optimum of the
    REFERENCE's WLS objective (poisson_rate_estimator.py:1136-1163) built
    entirely from the REFERENCE's data model (mask/τ/variances/varphis)."""
    ref_est, my_est = pair
    mask = ref_est.bucketized_counts.numpy() > 0
    tau = ref_est.total_bucketized_time.numpy()
    obs = ref_est.total_bucketized_obs.numpy()
    varphis = ref_est.varphis.numpy()
    var = ref_est.variances.numpy().copy()
    for i in range(len(var)):
        if mask[i]:
            var[i] = var[i] * tau[i] * ref_est.variance_correction(
                var[i] * tau[i]
            )
    Phi = (tau[mask, None] * varphis[mask])          # rows τ_i φ_i
    D = 1.0 / var[mask]
    A = 2.0 * (Phi * D[:, None]).T @ Phi + S_REG * np.eye(M)
    rhs = 2.0 * (Phi * D[:, None]).T @ obs[mask]
    theta_star = np.linalg.solve(A, rhs)
    # sanity: the unconstrained optimum is interior to the box in w-space
    # (otherwise constrained/unconstrained solutions differ by design)
    w_star = ref_est.cov().numpy() @ theta_star
    assert w_star.min() > 0.05 and w_star.max() < B - 0.05, w_star

    rate = np.asarray(my_est.least_squares_weighted()).ravel()
    # interior optimum (loose box) -> solver must land on the closed form
    assert np.abs(rate - theta_star).max() < 5e-3 * max(
        1.0, np.abs(theta_star).max()
    )
