"""Direct parity tests against the ACTUAL reference code at /root/reference.

These import the reference `stpy` package (torch, float64) and assert our
kernels / embeddings / posteriors match it numerically — stronger than
tests/test_torch_parity.py, which checks against hand-rewritten formulas.

The reference's heavy solver deps (cvxpy/MOSEK/pymanopt/torchmin/...) are
not installed here; they are stubbed at import time. That is safe for these
tests: every compared code path (Gram construction, QFF feature tables,
Cholesky/lstsq posterior algebra) is pure torch/numpy and never touches the
stubbed modules.

Known intentional/UPSTREAM deviations covered here:
  * QFF d>1: the reference keeps only the positive frequency orthant
    (embedding.py:364-394) which biases the kernel approximation O(1); we
    sign-symmetrize. Exact feature parity therefore holds at d=1, and at
    d=2 we assert our Gram approximation error is strictly smaller.
  * modified_matern: the reference's kernel function is broken (kernels.py
    :1000 uses `a` before assignment) — we assert the bug and compare our
    implementation against the reference's intended per-dim formula.
"""

import sys
import types
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

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
    stub(
        "pymanopt.manifolds",
        Euclidean=_Any, Stiefel=_Any, PSDFixedRank=_Any, Product=_Any,
        Rotations=_Any,
    )
    stub("pymanopt.optimizers", SteepestDescent=_Any)
    stub("pymanopt.solvers", ConjugateGradient=_Any)
    stub("mosek")
    stub("quadprog", solve_qp=_Any)
    stub("hamiltorch")
    stub("torchmin", minimize=_Any)
    stub("autograd_minimize", minimize=_Any)


torch = pytest.importorskip("torch")

import os  # noqa: E402

if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

if REF not in sys.path:
    sys.path.insert(0, REF)
_install_stubs()
warnings.filterwarnings("ignore", category=SyntaxWarning)
torch.set_default_dtype(torch.float64)

from stpy.kernels import KernelFunction as RefKernel  # noqa: E402

from stpy_tpu.kernels import KernelFunction as MyKernel  # noqa: E402


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (17, 3))
    b = rng.uniform(-1, 1, (11, 3))
    return a, b


# ---------------------------------------------------------------------------
# kernels: >= 10 distinct reference kernels, Gram matrices at f64
# ---------------------------------------------------------------------------

_ARD = [0.4, 0.6, 0.8]

KERNEL_CASES = [
    ("squared_exponential", dict(gamma=0.5), dict(gamma=0.5)),
    ("squared_exponential", dict(gamma=1.3, kappa=2.5), dict(gamma=1.3, kappa=2.5)),
    ("ard", dict(ard_gamma=torch.tensor(_ARD)), dict(ard_gamma=jnp.array(_ARD))),
    ("linear", {}, {}),
    ("laplace", dict(gamma=0.7), dict(gamma=0.7)),
    ("matern", dict(gamma=0.6, nu=0.5), dict(gamma=0.6, nu=0.5)),
    ("matern", dict(gamma=0.6, nu=1.5), dict(gamma=0.6, nu=1.5)),
    ("matern", dict(gamma=0.6, nu=2.5), dict(gamma=0.6, nu=2.5)),
    # general (non-half-integer) nu: reference uses scipy.special.kv, we use
    # on-device Bessel quadrature
    ("matern", dict(gamma=0.6, nu=2.0), dict(gamma=0.6, nu=2.0)),
    ("ard_matern", dict(ard_gamma=torch.tensor(_ARD), nu=1.5),
     dict(ard_gamma=jnp.array(_ARD), nu=1.5)),
    ("polynomial", dict(power=3), dict(power=3)),
    ("tanh", {}, {}),
]


@pytest.mark.parametrize("name,rkw,mkw", KERNEL_CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(KERNEL_CASES)])
def test_kernel_gram_matches_reference(name, rkw, mkw, xy):
    a, b = xy
    ref = RefKernel(kernel_name=name, d=3, **rkw)
    mine = MyKernel(kernel_name=name, d=3, **mkw)
    Kr = ref.kernel(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    Km = np.asarray(mine.kernel(jnp.asarray(a), jnp.asarray(b)))
    assert Kr.shape == Km.shape
    assert _rel(Km, Kr) < 1e-10, f"{name}: rel err {_rel(Km, Kr):.2e}"


def test_kernel_gram_step_wiener_gibbs():
    """1-D kernels with domain restrictions (step/wiener need x >= 0)."""
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (13, 1))
    b = rng.uniform(0, 1, (7, 1))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ja, jb = jnp.asarray(a), jnp.asarray(b)

    Kr = RefKernel(kernel_name="step", d=1).kernel(ta, tb).numpy()
    Km = np.asarray(MyKernel(kernel_name="step", d=1).kernel(ja, jb))
    assert _rel(Km, Kr) < 1e-12

    # wiener is implemented but not registered in the reference dispatch
    # (kernels.py:167-261 has no "wiener" branch), and its body is broken on
    # modern torch (kernels.py:1058 torch.from_numpy on a 0-d scalar raises
    # TypeError). Assert the breakage, then check our kernel against the
    # intended formula k(x, y) = sum_i min(x_i, y_i), transposed.
    ref = RefKernel(kernel_name="step", d=1)
    with pytest.raises(TypeError):
        ref.wiener_kernel(ta, tb)
    Kr = np.minimum(a, b.T).T
    Km = np.asarray(MyKernel(kernel_name="wiener", d=1).kernel(ja, jb))
    assert _rel(Km, Kr) < 1e-12

    # gibbs is NOT gram-compared: the reference's gibbs_kernel multiplies a
    # (n_b, n_a) sqdist by an (n_a, n_b) lengthscale matrix (kernels.py:
    # 449-461) — it broadcast-errors for n_a != n_b and mixes indices when
    # square. Our implementation follows the intended formula and is covered
    # by tests/test_torch_parity.py.


def test_angsim_matches_reference_per_pair(xy):
    """The reference's angsim_kernel only handles single vectors (a.dot(b)
    raises on 2-D tensors, kernels.py:764), so its own Gram path is broken
    for matrix inputs. Compare per-pair values."""
    a, b = xy
    ref = RefKernel(kernel_name="angsim", d=3)
    Km = np.asarray(
        MyKernel(kernel_name="angsim", d=3).kernel(jnp.asarray(a),
                                                   jnp.asarray(b))
    )  # (n_b, n_a) reference convention
    for i in range(0, a.shape[0], 5):
        for j in range(0, b.shape[0], 3):
            v = float(ref.angsim_kernel(torch.from_numpy(a[i]),
                                        torch.from_numpy(b[j])))
            assert abs(Km[j, i] - v) < 1e-12


def test_kernel_algebra_matches_reference(xy):
    a, b = xy
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ja, jb = jnp.asarray(a), jnp.asarray(b)

    r = (RefKernel(kernel_name="squared_exponential", gamma=0.5, d=3)
         + RefKernel(kernel_name="linear", d=3))
    m = (MyKernel(kernel_name="squared_exponential", gamma=0.5, d=3)
         + MyKernel(kernel_name="linear", d=3))
    assert _rel(np.asarray(m.kernel(ja, jb)), r.kernel(ta, tb).numpy()) < 1e-10

    r = (RefKernel(kernel_name="squared_exponential", gamma=0.5, d=3)
         * RefKernel(kernel_name="laplace", gamma=0.7, d=3))
    m = (MyKernel(kernel_name="squared_exponential", gamma=0.5, d=3)
         * MyKernel(kernel_name="laplace", gamma=0.7, d=3))
    assert _rel(np.asarray(m.kernel(ja, jb)), r.kernel(ta, tb).numpy()) < 1e-10


def test_modified_matern_reference_bug_and_intended_formula(xy):
    """The reference's modified_matern_kernel crashes (kernels.py:1000:
    `a = a[:, group]` before `a` exists). Assert the bug is really there,
    then check our kernel against the reference's INTENDED formula (the
    per-dim product loop that follows the dead lines, kernels.py:1003-1024).
    """
    a, b = xy
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref = RefKernel(kernel_name="modified_matern", gamma=0.6, nu=2, d=3)
    with pytest.raises(UnboundLocalError):
        ref.kernel(ta, tb)

    # intended formula, transcribed from the loop body (v=2 branch)
    Z = np.ones((b.shape[0], a.shape[0]))
    for i in range(3):
        dists = np.abs(a[:, i:i + 1] / 0.6 - b[:, i:i + 1].T / 0.6).T
        Z = Z * (1 + dists) * np.exp(-dists)
    Km = np.asarray(
        MyKernel(kernel_name="modified_matern", gamma=0.6, nu=2, d=3)
        .kernel(jnp.asarray(a), jnp.asarray(b))
    )
    assert _rel(Km, Z) < 1e-12


# ---------------------------------------------------------------------------
# embeddings: exact feature parity at d=1 (d>1 is a documented bias-fix
# deviation), induced-kernel parity for polynomial
# ---------------------------------------------------------------------------

def _ref_embeddings():
    from stpy.embeddings.embedding import (
        ClenshawCurtisEmbedding, HermiteEmbedding, MaternEmbedding,
        QuadratureEmbedding, TrapezoidalEmbedding,
    )
    return dict(
        hermite=HermiteEmbedding, quadrature=QuadratureEmbedding,
        trapezoidal=TrapezoidalEmbedding, clenshaw=ClenshawCurtisEmbedding,
        matern=MaternEmbedding,
    )


EMB_CASES = [
    ("hermite", dict(gamma=0.5, m=64, d=1)),
    ("quadrature", dict(gamma=0.5, m=64, d=1)),
    ("trapezoidal", dict(gamma=0.5, m=64, d=1)),
    ("clenshaw", dict(gamma=0.5, m=64, d=1)),
    ("matern", dict(gamma=0.5, m=64, d=1, kernel="modified_matern", nu=2)),
]


@pytest.mark.parametrize("name,kw", EMB_CASES, ids=[c[0] for c in EMB_CASES])
def test_qff_features_match_reference_d1(name, kw):
    import stpy_tpu.embeddings.fourier as myf

    refs = _ref_embeddings()
    my_cls = dict(
        hermite=myf.HermiteEmbedding, quadrature=myf.QuadratureEmbedding,
        trapezoidal=myf.TrapezoidalEmbedding,
        clenshaw=myf.ClenshawCurtisEmbedding, matern=myf.MaternEmbedding,
    )[name]
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (9, 1))
    Fr = refs[name](**kw).embed(torch.from_numpy(x)).numpy()
    Fm = np.asarray(my_cls(**kw).embed(jnp.asarray(x)))
    assert Fr.shape == Fm.shape
    assert np.max(np.abs(Fr - Fm)) < 1e-12


def test_qff_d2_beats_reference_orthant_bias():
    """At d=2 the reference's positive-orthant QFF has O(1) Gram bias; our
    sign-symmetrized grid must approximate the true SE kernel far better
    with the same feature budget."""
    import stpy_tpu.embeddings.fourier as myf
    from stpy.embeddings.embedding import HermiteEmbedding as RefH

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (64, 2))
    gamma = 0.5
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    Ktrue = np.exp(-sq / (2 * gamma * gamma))

    Fr = RefH(gamma=gamma, m=512, d=2).embed(torch.from_numpy(x)).numpy()
    Fm = np.asarray(myf.HermiteEmbedding(gamma=gamma, m=512, d=2)
                    .embed(jnp.asarray(x)))
    err_ref = np.max(np.abs(Fr @ Fr.T - Ktrue))
    err_my = np.max(np.abs(Fm @ Fm.T - Ktrue))
    assert err_my < 1e-6
    assert err_my < err_ref / 1e3


def test_polynomial_embedding_induced_kernel_matches():
    from stpy.embeddings.polynomial_embedding import (
        PolynomialEmbedding as RefP,
    )

    import stpy_tpu.embeddings.polynomial as myp

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (9, 2))
    y = rng.uniform(-1, 1, (6, 2))
    ref = RefP(d=2, p=3)
    mine = myp.PolynomialEmbedding(d=2, p=3)
    Fr_x = ref.embed(torch.from_numpy(x)).numpy()
    Fr_y = ref.embed(torch.from_numpy(y)).numpy()
    Fm_x = np.asarray(mine.embed(jnp.asarray(x)))
    Fm_y = np.asarray(mine.embed(jnp.asarray(y)))
    # monomial ORDER differs; the induced kernel (feature inner products)
    # is the behavioral contract
    assert _rel(Fm_x @ Fm_y.T, Fr_x @ Fr_y.T) < 1e-10


# ---------------------------------------------------------------------------
# posteriors: exact GP and feature GP end-to-end vs the reference at f64
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def regression_data():
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (64, 2))
    y = np.sin(3 * x[:, :1]) + 0.1 * rng.standard_normal((64, 1))
    xt = rng.uniform(-1, 1, (32, 2))
    return x, y, xt


def test_exact_gp_posterior_matches_reference(regression_data):
    from stpy.continuous_processes.gauss_procc import (
        GaussianProcess as RefGP,
    )

    from stpy_tpu.models import GaussianProcess as MyGP

    x, y, xt = regression_data
    ref = RefGP(kernel_name="squared_exponential", gamma=0.5, s=0.1, d=2)
    ref.fit_gp(torch.from_numpy(x), torch.from_numpy(y))
    mu_r, std_r = ref.mean_std(torch.from_numpy(xt))

    kernel = MyKernel(kernel_name="squared_exponential", gamma=0.5, d=2)
    mine = MyGP(kernel=kernel, s=0.1, d=2)
    mine.fit_gp(jnp.asarray(x), jnp.asarray(y))
    mu_m, std_m = mine.mean_std(jnp.asarray(xt))

    assert _rel(np.asarray(mu_m), mu_r.detach().numpy()) < 1e-8
    assert _rel(np.asarray(std_m), std_r.detach().numpy()) < 1e-7


def test_feature_gp_posterior_matches_reference(regression_data):
    from stpy.continuous_processes.kernelized_features import (
        KernelizedFeatures as RefKF,
    )
    from stpy.embeddings.embedding import HermiteEmbedding as RefH

    import stpy_tpu.embeddings.fourier as myf
    from stpy_tpu.models import KernelizedFeatures as MyKF

    x, y, xt = regression_data
    x1, xt1 = x[:, :1], xt[:, :1]  # d=1 for exact feature parity
    m = 64
    ref = RefKF(embedding=RefH(gamma=0.5, m=m, d=1), m=m, d=1, s=0.1)
    ref.fit_gp(torch.from_numpy(x1), torch.from_numpy(y))
    mu_r, std_r = ref.mean_std(torch.from_numpy(xt1))

    mine = MyKF(embedding=myf.HermiteEmbedding(gamma=0.5, m=m, d=1), m=m,
                d=1, s=0.1)
    mine.fit_gp(jnp.asarray(x1), jnp.asarray(y))
    mu_m, std_m = mine.mean_std(jnp.asarray(xt1))

    assert _rel(np.asarray(mu_m), mu_r.detach().numpy()) < 1e-8
    assert _rel(np.asarray(std_m), std_r.detach().numpy()) < 1e-6
