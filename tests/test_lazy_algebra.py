"""Matrix-free tier generality: ARD lengthscales and kernel algebra
(VERDICT r2 items 1-2).

The reference's hyperopt/evidence work for ANY kernel the library can
build (stpy/estimator.py:141-223, stpy/kernels.py:76-94,136-159,552);
these tests pin the same generality onto the lazy/BBMM tier:
  * per-dim (ARD) evidence gradients match dense autodiff;
  * `IterativeGP.optimize_params` PRESERVES an ARD vector and recovers
    distinct lengthscales on anisotropic data (the r2 silent-collapse bug);
  * sums `k1 + k2` of fused atoms: lazy matvec + evidence grads + hyperfit;
  * arbitrary kernels (products, laplace) via the chunked general tier.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.kernels import functions as F


def _dense_nll_ard(x, yv, gvec, kappa, noise):
    K = kappa * jnp.exp(-F.sq_dist(x / gvec, x / gvec) / 2)
    n = yv.shape[0]
    A = K + noise**2 * jnp.eye(n)
    L = jnp.linalg.cholesky(A)
    a = jax.scipy.linalg.cho_solve((L, True), yv)
    return (0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
            + 0.5 * n * jnp.log(2 * jnp.pi))


def test_lazy_evidence_ard_grads_match_dense_autodiff():
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_lazy

    rng = np.random.default_rng(31)
    n, d = 180, 3
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    yv = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0])
                     + 0.1 * rng.standard_normal(n))
    g0 = jnp.asarray([0.4, 0.9, 1.7])
    k0, s0 = 1.3, 0.4

    val_ref = float(_dense_nll_ard(x, yv, g0, k0, s0))
    gr = jax.grad(
        lambda g, k, s: _dense_nll_ard(x, yv, g, k, s), argnums=(0, 1, 2)
    )(g0, k0, s0)

    nll, grads = evidence_value_and_grad_lazy(
        x, yv, g0, k0, s0, probes=600, cg_tol=1e-10, cg_maxiter=600,
        lanczos_iters=60,
    )
    assert abs(float(nll) - val_ref) / abs(val_ref) < 0.02
    g_est = np.asarray(grads["gamma"])
    g_ref = np.asarray(gr[0])
    assert g_est.shape == (d,)
    for c in range(d):
        denom = max(abs(g_ref[c]), 1.0)
        assert abs(g_est[c] - g_ref[c]) / denom < 0.06, (c, g_est, g_ref)
    for name, est, ref in (("kappa", grads["kappa"], gr[1]),
                           ("noise", grads["noise"], gr[2])):
        denom = max(abs(float(ref)), 1.0)
        assert abs(float(est) - float(ref)) / denom < 0.06, name


def test_iterative_gp_optimize_params_preserves_ard_vector():
    """The r2 bug repro: optimize_params on an ARD kernel must keep a
    per-dim vector (NOT collapse to a scalar) and recover distinct
    lengthscales on anisotropic data."""
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(11)
    n = 300
    x = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    # y depends strongly on dim 0 (short scale), weakly on dim 2 (long)
    y = jnp.asarray(
        np.sin(6 * np.asarray(x)[:, :1])
        + 0.2 * np.asarray(x)[:, 2:3]
        + 0.05 * rng.standard_normal((n, 1))
    )
    k = KernelFunction(kernel_name="ard", ard_gamma=[0.2, 1.0, 3.0], d=3)
    gp = IterativeGP(k, s=0.3, lazy=True, tol=1e-8, maxiter=400)
    gp.fit_gp(x, y)
    out = gp.optimize_params(
        steps=40, lr=0.15, probes=128, tol=1e-3,
        cg_tol=1e-8, cg_maxiter=400, probe_tol=1e-4, probe_maxiter=200,
        key=jax.random.PRNGKey(5),
    )
    fitted = np.asarray(k.params_dict["0"]["ard_gamma"]).reshape(-1)
    # still a 3-vector with DISTINCT entries (not an overwritten scalar)
    assert fitted.shape == (3,)
    assert np.std(fitted) > 1e-3, fitted
    # anisotropy direction recovered: dim 0 needs a shorter lengthscale
    # than dim 2 (which barely matters)
    assert fitted[0] < fitted[2], fitted
    mu = gp.mean(x[:16])
    assert np.all(np.isfinite(np.asarray(mu)))


def test_lazy_evidence_sum_kernel_grads_match_dense_autodiff():
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_sum

    rng = np.random.default_rng(13)
    n = 160
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    yv = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0])
                     + 0.1 * rng.standard_normal(n))
    g1, k1, g2, k2, s0 = 0.5, 1.2, 1.1, 0.7, 0.35

    def dense_nll(ga, ka, gb, kb, s):
        sq = F.sq_dist(x / ga, x / ga)
        Ka = ka * jnp.exp(-sq / 2)
        r = jnp.sqrt(F.sq_dist(x / gb, x / gb) + 1e-30)
        kk = np.sqrt(3.0) * r
        Kb = kb * (1 + kk) * jnp.exp(-kk)
        A = Ka + Kb + s**2 * jnp.eye(n)
        L = jnp.linalg.cholesky(A)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        return (0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * n * jnp.log(2 * jnp.pi))

    gr = jax.grad(dense_nll, argnums=(0, 1, 2, 3, 4))(g1, k1, g2, k2, s0)
    desc = (("se", 1.0, None), ("matern", 1.5, None))
    nll, grads = evidence_value_and_grad_sum(
        x, yv, desc, [g1, g2], [k1, k2], s0,
        probes=600, cg_tol=1e-10, cg_maxiter=600, lanczos_iters=60,
    )
    ests = [grads["gammas"][0], grads["kappas"][0],
            grads["gammas"][1], grads["kappas"][1], grads["noise"]]
    for name, est, ref in zip(
        ("g1", "k1", "g2", "k2", "noise"), ests, gr
    ):
        denom = max(abs(float(ref)), 1.0)
        assert abs(float(est) - float(ref)) / denom < 0.06, (
            name, float(est), float(ref))
    val_ref = float(dense_nll(g1, k1, g2, k2, s0))
    assert abs(float(nll) - val_ref) / abs(val_ref) < 0.02


def test_iterative_gp_sum_kernel_fit_and_hyperfit():
    """k_se + k_matern: lazy CG fit matches the dense GP, and
    optimize_params improves the dense evidence (VERDICT item 2 done-bar)."""
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(23)
    n = 240
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1])
                    + 0.1 * rng.standard_normal((n, 1)))

    def mk(gamma_se, gamma_mat):
        return (
            KernelFunction(kernel_name="squared_exponential",
                           gamma=gamma_se, d=2)
            + KernelFunction(kernel_name="matern", gamma=gamma_mat,
                             nu=1.5, d=2)
        )

    k = mk(0.5, 0.8)
    ref = GaussianProcess(kernel=mk(0.5, 0.8), s=0.2)
    ref.fit_gp(x, y)
    mu_ref, _ = ref.mean_std(x[:32])

    gp = IterativeGP(k, s=0.2, lazy=True, tol=1e-10, maxiter=800)
    gp.fit_gp(x, y)
    mu = gp.mean(x[:32])
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6

    # hyperfit from a bad start must improve the dense evidence
    k_bad = mk(2.0, 2.5)
    gp2 = IterativeGP(k_bad, s=0.4, lazy=True, tol=1e-8, maxiter=400)
    gp2.fit_gp(x, y)

    def dense_nll(kern, s):
        gp_d = GaussianProcess(kernel=kern, s=s)
        gp_d.x, gp_d.y = x, y
        return float(gp_d.log_marginal_params(
            kern, kern.params_dict, jnp.asarray(s)))

    before = dense_nll(mk(2.0, 2.5), 0.4)
    out = gp2.optimize_params(
        steps=30, lr=0.15, probes=128, tol=1e-3, cg_tol=1e-8,
        cg_maxiter=400, probe_tol=1e-4, probe_maxiter=200,
        key=jax.random.PRNGKey(3),
    )
    g_se = float(k_bad.params_dict["0"]["gamma"])
    g_mat = float(k_bad.params_dict["1"]["gamma"])
    after = dense_nll(mk(g_se, g_mat), gp2.s)
    assert after < before - 1.0, (before, after)
    assert out["steps_run"] >= 5


def test_iterative_gp_double_precision_refined_mean():
    """IterativeGP(precision='double'): the dense tier's df story beyond
    HBM — f32 PCG + exact-df-residual refinement + df mean GEMV. On CPU
    x64 the df ops run their exact f64 fallbacks, so the refined mean
    must land on the direct f64 solve well past the inner CG tolerance;
    the ragged df_chunk exercises the row-chunked GEMV."""
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(7)
    n, d = 300, 2
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1])
                    + 0.1 * rng.standard_normal((n, 1)))
    xt = jnp.asarray(rng.uniform(-1, 1, (64, d)))

    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)
         + KernelFunction(kernel_name="matern", gamma=0.8, nu=1.5, d=d))

    # f64 reference posterior mean
    Kd = np.asarray(k.eval_params(k.params_dict, x, x), np.float64)
    Ksd = np.asarray(k.eval_params(k.params_dict, xt, x), np.float64)
    alpha64 = np.linalg.solve(Kd + 0.04 * np.eye(n), np.asarray(y))
    mu64 = Ksd @ alpha64

    # deliberately loose inner CG so the refinement has work to do
    gp = IterativeGP(k, s=0.2, lazy=True, tol=1e-6, maxiter=400,
                     precision="double", df_refine_steps=2, df_chunk=128)
    gp.fit_gp(x, y)
    assert gp._A_df is not None and gp._A_df.shape == (n, 2)
    mu = np.asarray(gp.mean(xt))
    rel = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
    assert rel < 1e-9, rel

    # single mode on the same tolerance is measurably worse — the
    # refinement is doing the work, not the CG tolerance
    gp1 = IterativeGP(k, s=0.2, lazy=True, tol=1e-6, maxiter=400)
    gp1.fit_gp(x, y)
    rel1 = np.max(np.abs(np.asarray(gp1.mean(xt)) - mu64)) / np.max(
        np.abs(mu64))
    assert rel1 > rel * 10

    # mesh tiers are f32 — double must raise, not silently downgrade
    with pytest.raises(ValueError):
        IterativeGP(k, s=0.2, precision="triple")


def test_pivoted_cholesky_preconditioner_cuts_cg_iterations():
    """Rank-r pivoted Cholesky (matrix-free, any kernel) approximates the
    Gram and its Woodbury apply slashes CG iterations on an
    ill-conditioned system (the r3 fix for the 65k stalled fit)."""
    from stpy_tpu.parallel import (
        IterativeGP, cg_solve, make_pivchol_precond,
        pivoted_cholesky_kernel,
    )

    rng = np.random.default_rng(61)
    n = 400
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    yv = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0]))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.8, d=2)
    s = 0.05

    # low-rank approximation quality: residual trace shrinks fast
    Lm = pivoted_cholesky_kernel(k, x, 60)
    K = k.gram(x)
    resid = K - Lm.T @ Lm
    assert float(jnp.trace(resid)) / float(jnp.trace(K)) < 1e-2
    # psd-ish residual (pivoted Cholesky guarantees it up to roundoff)
    assert float(jnp.min(jnp.diagonal(resid))) > -1e-8

    A = K + s * s * jnp.eye(n)
    mv = lambda v: A @ v
    _, it_plain, _ = cg_solve(mv, yv, tol=1e-8, maxiter=2000)
    M_inv = make_pivchol_precond(Lm, s)
    sol, it_pre, res = cg_solve(mv, yv, M_inv=M_inv, tol=1e-8, maxiter=2000)
    assert int(it_pre) < int(it_plain) / 3, (int(it_pre), int(it_plain))
    ref = jnp.linalg.solve(A, yv)
    # ||sol - ref|| <= ||A^-1||*||r|| ~ (1/s^2)*tol*||b||: the residual
    # stop only bounds the solution to kappa*tol (~2e-6 here), so the
    # bound carries that slack
    assert float(jnp.max(jnp.abs(sol - ref))) < 1e-5

    # end-to-end through IterativeGP(precond_rank=...)
    gp = IterativeGP(k, s=s, lazy=True, tol=1e-8, maxiter=2000,
                     precond_rank=60)
    gp.fit_gp(x, yv.reshape(-1, 1))
    assert gp.cg_iterations <= int(it_pre) + 5
    from stpy_tpu.models.exact_gp import GaussianProcess

    refgp = GaussianProcess(kernel=k, s=s)
    refgp.fit_gp(x, yv.reshape(-1, 1))
    mu_ref, std_ref = refgp.mean_std(x[:16])
    mu, std = gp.mean_std(x[:16])
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6
    assert float(jnp.max(jnp.abs(std - std_ref))) < 1e-5


def test_chunked_matvec_matches_dense_any_kernel():
    from stpy_tpu.parallel.lazy_kernel import (
        make_chunked_matmat, make_chunked_matvec,
    )

    rng = np.random.default_rng(29)
    n = 150
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    v = jnp.asarray(rng.standard_normal(n))
    V = jnp.asarray(rng.standard_normal((n, 4)))

    # product kernel — outside the fused-atom families
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=2)
         * KernelFunction(kernel_name="linear", d=2))
    K = k.gram(x)
    s = 0.3
    mv = make_chunked_matvec(k, x, noise=s, chunk=64)
    mm = make_chunked_matmat(k, x, noise=s, chunk=64)
    ref_v = K @ v + s * s * v
    assert float(jnp.max(jnp.abs(mv(v) - ref_v))) < 1e-8
    ref_V = K @ V + s * s * V
    assert float(jnp.max(jnp.abs(mm(V) - ref_V))) < 1e-8


def test_general_evidence_grads_product_kernel():
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_general

    rng = np.random.default_rng(37)
    n = 140
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    yv = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0])
                     + 0.1 * rng.standard_normal(n))
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.7, d=2)
         * KernelFunction(kernel_name="matern", gamma=1.2, nu=2.5, d=2))

    def dense_nll(g0, g1, s):
        sq0 = F.sq_dist(x / g0, x / g0)
        K0 = jnp.exp(-sq0 / 2)
        r = jnp.sqrt(F.sq_dist(x / g1, x / g1) + 1e-30)
        kk = np.sqrt(5.0) * r
        K1 = (1 + kk + kk * kk / 3) * jnp.exp(-kk)
        A = K0 * K1 + s**2 * jnp.eye(n)
        L = jnp.linalg.cholesky(A)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        return (0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * n * jnp.log(2 * jnp.pi))

    s0 = 0.35
    gr = jax.grad(dense_nll, argnums=(0, 1, 2))(0.7, 1.2, s0)
    _, grads = evidence_value_and_grad_general(
        k, x, yv, noise=s0, chunk=64, probes=500, cg_tol=1e-10,
        cg_maxiter=600, probe_tol=1e-8, probe_maxiter=600,
        compute_value=False,
    )
    ests = (grads["params"]["0"]["gamma"], grads["params"]["1"]["gamma"],
            grads["noise"])
    for name, est, ref in zip(("g0", "g1", "noise"), ests, gr):
        denom = max(abs(float(ref)), 1.0)
        assert abs(float(est) - float(ref)) / denom < 0.06, (
            name, float(est), float(ref))


def test_iterative_gp_general_kernel_hyperfit_product():
    """Product kernel hyperfit through IterativeGP.optimize_params (the
    general chunked tier): evidence must improve, params written back."""
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(41)
    n = 200
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)[:, :1])
                    + 0.1 * rng.standard_normal((n, 1)))

    def mk(g0, g1):
        return (KernelFunction(kernel_name="squared_exponential",
                               gamma=g0, d=2)
                * KernelFunction(kernel_name="matern", gamma=g1, nu=1.5,
                                 d=2))

    k = mk(2.0, 2.0)
    gp = IterativeGP(k, s=0.4, lazy=True, tol=1e-8, maxiter=400, chunk=64)
    gp.fit_gp(x, y)

    def dense_nll(kern, s):
        g = GaussianProcess(kernel=kern, s=s)
        g.x, g.y = x, y
        return float(g.log_marginal_params(kern, kern.params_dict,
                                           jnp.asarray(s)))

    before = dense_nll(mk(2.0, 2.0), 0.4)
    gp.optimize_params(
        steps=25, lr=0.15, probes=64, tol=1e-3, cg_tol=1e-8,
        cg_maxiter=400, probe_tol=1e-4, probe_maxiter=300,
        key=jax.random.PRNGKey(9),
    )
    g0 = float(k.params_dict["0"]["gamma"])
    g1 = float(k.params_dict["1"]["gamma"])
    after = dense_nll(mk(g0, g1), gp.s)
    assert after < before - 1.0, (before, after)
    assert (g0, g1) != (2.0, 2.0)


def test_iterative_gp_sum_of_grouped_atoms_fast_tier():
    """k_se(x0) + k_matern(x1): per-coordinate-group FUSED atoms (the fast
    sum tier, not the chunked fallback) — fit matches dense, hyperfit
    writes per-atom gammas back."""
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel import IterativeGP
    from stpy_tpu.parallel.lazy_kernel import fast_atoms

    rng = np.random.default_rng(53)
    n = 220
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)[:, :1])
                    + 0.3 * np.asarray(x)[:, 1:2]
                    + 0.1 * rng.standard_normal((n, 1)))

    def mk(g0, g1):
        return (
            KernelFunction(kernel_name="squared_exponential", gamma=g0,
                           group=[0], d=2)
            + KernelFunction(kernel_name="matern", gamma=g1, nu=1.5,
                             group=[1], d=2)
        )

    k = mk(0.5, 0.8)
    atoms = fast_atoms(k)
    assert atoms is not None and len(atoms) == 2  # fused tier, not chunked
    assert atoms[0].group == (0,) and atoms[1].group == (1,)

    ref = GaussianProcess(kernel=mk(0.5, 0.8), s=0.2)
    ref.fit_gp(x, y)
    mu_ref, _ = ref.mean_std(x[:24])
    gp = IterativeGP(k, s=0.2, lazy=True, tol=1e-10, maxiter=800)
    gp.fit_gp(x, y)
    assert float(jnp.max(jnp.abs(gp.mean(x[:24]) - mu_ref))) < 1e-6

    k_bad = mk(2.5, 2.5)
    gp2 = IterativeGP(k_bad, s=0.4, lazy=True, tol=1e-8, maxiter=400)
    gp2.fit_gp(x, y)

    def dense_nll(kern, s):
        g = GaussianProcess(kernel=kern, s=s)
        g.x, g.y = x, y
        return float(g.log_marginal_params(kern, kern.params_dict,
                                           jnp.asarray(s)))

    before = dense_nll(mk(2.5, 2.5), 0.4)
    gp2.optimize_params(
        steps=25, lr=0.15, probes=64, tol=1e-3, cg_tol=1e-8,
        cg_maxiter=400, probe_tol=1e-4, probe_maxiter=300,
        key=jax.random.PRNGKey(21),
    )
    g0 = float(k_bad.params_dict["0"]["gamma"])
    g1 = float(k_bad.params_dict["1"]["gamma"])
    after = dense_nll(mk(g0, g1), gp2.s)
    assert after < before - 1.0, (before, after)


def test_iterative_gp_additive_groups_kernel_lazy():
    """Additive-over-groups ARD kernel through the lazy tier (general
    chunked matvec): fit matches dense, hyperfit improves the evidence
    (VERDICT r2 item 2 done-bar)."""
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(47)
    n = 200
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)[:, :1])
                    + 0.3 * np.asarray(x)[:, 1:2]
                    + 0.1 * rng.standard_normal((n, 1)))

    def mk(g0, g1):
        return KernelFunction(kernel_name="ard", groups=[[0], [1]],
                              ard_gamma=[g0, g1], d=2)

    k = mk(0.6, 0.9)
    ref = GaussianProcess(kernel=mk(0.6, 0.9), s=0.2)
    ref.fit_gp(x, y)
    mu_ref, _ = ref.mean_std(x[:24])

    gp = IterativeGP(k, s=0.2, lazy=True, tol=1e-10, maxiter=800, chunk=64)
    gp.fit_gp(x, y)
    mu = gp.mean(x[:24])
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6

    def dense_nll(kern, s):
        g = GaussianProcess(kernel=kern, s=s)
        g.x, g.y = x, y
        return float(g.log_marginal_params(kern, kern.params_dict,
                                           jnp.asarray(s)))

    k_bad = mk(3.0, 3.0)
    gp2 = IterativeGP(k_bad, s=0.4, lazy=True, tol=1e-8, maxiter=400,
                      chunk=64)
    gp2.fit_gp(x, y)
    before = dense_nll(mk(3.0, 3.0), 0.4)
    gp2.optimize_params(
        steps=25, lr=0.15, probes=64, tol=1e-3, cg_tol=1e-8,
        cg_maxiter=400, probe_tol=1e-4, probe_maxiter=300,
        key=jax.random.PRNGKey(13),
    )
    gv = np.asarray(k_bad.params_dict["0"]["ard_gamma"]).reshape(-1)
    after = dense_nll(mk(float(gv[0]), float(gv[1])), gp2.s)
    assert after < before - 1.0, (before, after)


def test_fit_evidence_lazy_ard_recovers_anisotropy():
    """fit_evidence_lazy with a vector gamma0 optimizes per-dim and beats
    an isotropic fit on anisotropic data (dense-evidence comparison)."""
    from stpy_tpu.parallel import fit_evidence_lazy

    rng = np.random.default_rng(17)
    n = 256
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    # short scale in dim 0, dim 1 pure noise-dimension
    yv = jnp.asarray(np.sin(6 * np.asarray(x)[:, 0])
                     + 0.05 * rng.standard_normal(n))

    out = fit_evidence_lazy(
        x, yv, gamma0=np.array([1.0, 1.0]), noise0=0.3,
        steps=40, lr=0.15, probes=128, cg_tol=1e-8, cg_maxiter=400,
        probe_tol=1e-4, probe_maxiter=200, tol=1e-3,
        key=jax.random.PRNGKey(2),
    )
    g = np.asarray(out["gamma"]).reshape(-1)
    assert g.shape == (2,)
    # relevant dim gets the shorter lengthscale
    assert g[0] < g[1], g
    val_ard = float(_dense_nll_ard(x, yv, jnp.asarray(g), 1.0,
                                   out["noise"]))
    val_start = float(_dense_nll_ard(x, yv, jnp.ones(2), 1.0, 0.3))
    assert val_ard < val_start - 5.0


def test_nystrom_precond_evidence_solves():
    """Randomized-Nystrom preconditioning (precond_rank>0) slashes CG
    iterations on an ill-conditioned system and leaves the BBMM evidence
    value/gradients unchanged (the preconditioner only accelerates the
    solves). Guards the r3 fix for the 65k stalled hyperfit."""
    from stpy_tpu.parallel import cg_solve, nystrom_precond_from_cross
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_lazy

    rng = np.random.default_rng(71)
    n, d, s, gamma = 500, 2, 0.03, 0.9
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    sq = jnp.maximum(jnp.sum(x * x, 1)[:, None] + jnp.sum(x * x, 1)[None, :]
                     - 2 * x @ x.T, 0)
    K = jnp.exp(-sq / (2 * gamma * gamma))
    A = K + s * s * jnp.eye(n)
    yv = jnp.sin(3 * x[:, 0])

    mv = lambda v: A @ v
    _, it0, _ = cg_solve(mv, yv, tol=1e-8, maxiter=3000)
    idx = jnp.asarray(rng.choice(n, 100, replace=False))
    M_inv = nystrom_precond_from_cross(K[:, idx], idx, jnp.asarray(s))
    sol, it1, _ = cg_solve(mv, yv, M_inv=M_inv, tol=1e-8, maxiter=3000)
    assert int(it1) < int(it0) / 4, (int(it1), int(it0))
    ref = jnp.linalg.solve(A, yv)
    # residual-based stop: solution error ~ tol·||b||/λmin ≈ 1e-5 here
    assert float(jnp.max(jnp.abs(sol - ref))) < 1e-4

    kw = dict(noise=s, cg_tol=1e-8, cg_maxiter=3000, probes=32,
              probe_maxiter=3000, probe_tol=1e-8)
    nll0, g0 = evidence_value_and_grad_lazy(x, yv, gamma, **kw)
    nll1, g1 = evidence_value_and_grad_lazy(x, yv, gamma, precond_rank=100,
                                            **kw)
    assert abs(float(nll0) - float(nll1)) < 1e-4 * abs(float(nll0))
    for k in g0:
        a, b = float(jnp.asarray(g0[k]).ravel()[0]), float(
            jnp.asarray(g1[k]).ravel()[0])
        assert abs(a - b) < 1e-5 * max(1.0, abs(a)), (k, a, b)


def test_nystrom_precond_general_kernel_path():
    """precond_rank on the any-kernel (chunked autodiff) evidence tier:
    gradients match the unpreconditioned run for a product kernel."""
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_general

    rng = np.random.default_rng(72)
    n = 300
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    yv = jnp.asarray(np.sin(4 * np.asarray(x)[:, 0])
                     + 0.1 * rng.standard_normal(n))
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.7, d=2)
         * KernelFunction(kernel_name="matern", gamma=1.2, nu=1.5, d=2))

    kw = dict(noise=0.05, chunk=128, probes=16, cg_tol=1e-8,
              cg_maxiter=2000, probe_tol=1e-8, probe_maxiter=2000,
              key=jax.random.PRNGKey(5))
    nll0, g0 = evidence_value_and_grad_general(k, x, yv, **kw)
    nll1, g1 = evidence_value_and_grad_general(k, x, yv, precond_rank=80,
                                               **kw)
    assert abs(float(nll0) - float(nll1)) < 1e-4 * abs(float(nll0))
    flat0 = jax.tree_util.tree_leaves(g0["params"])
    flat1 = jax.tree_util.tree_leaves(g1["params"])
    for a, b in zip(flat0, flat1):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * max(
            1.0, float(jnp.max(jnp.abs(a)))), (a, b)


def test_randomized_eig_precond_high_condition_f32():
    """Two-pass randomized EVD preconditioner at the 65k-like condition
    ratio (λmax/σ² ≈ 2e6) in f32 — the regime where inverse-based lifts
    (eigh-and-lift, QR-Nyström) produced junk eigenvalue estimates and
    non-monotonic rank behavior (r3 batches H/H2/K). Asserts EVERY rank
    in the sweep accelerates CG: stability must be rank-monotone, not
    anecdotal."""
    from stpy_tpu.parallel import cg_solve, randomized_eig_precond

    rng = np.random.default_rng(73)
    n, d, s = 1536, 2, 0.02
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    sq = jnp.maximum(jnp.sum(x * x, 1)[:, None] + jnp.sum(x * x, 1)[None, :]
                     - 2 * x @ x.T, 0)
    K = jnp.exp(-sq / (2 * 0.7 * 0.7)) + jnp.exp(
        -jnp.sqrt(sq + 1e-12) / 1.1)          # smooth + rough, like C4
    A = K + jnp.float32(s * s) * jnp.eye(n, dtype=jnp.float32)
    yv = jnp.sin(3 * x[:, 0]).astype(jnp.float32)
    assert A.dtype == jnp.float32

    mv = lambda v: A @ v
    mm = lambda V: A @ V
    _, it0, res0 = cg_solve(mv, yv, tol=1e-6, maxiter=1500)
    # unpreconditioned CG cannot reach tol here; the r4 stagnation stop
    # ends it honestly at its f32 floor instead of wandering to maxiter
    assert float(res0) > 1e-6, float(res0)
    assert int(it0) < 1500, int(it0)

    iters = []
    for rank in (96, 192, 384):
        M_inv = randomized_eig_precond(mm, n, rank, jnp.float32(s),
                                       jax.random.PRNGKey(3))
        # SPD sanity of the apply on a random probe pair
        z1 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        z2 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        q1 = float(z1 @ M_inv(z1))
        sym = float(z1 @ M_inv(z2)) - float(z2 @ M_inv(z1))
        assert q1 > 0.0
        assert abs(sym) < 1e-3 * abs(q1)
        sol, it1, res1 = cg_solve(mv, yv, M_inv=M_inv, tol=1e-6,
                                  maxiter=1500)
        # every rank reaches a residual the bare f32 solve cannot —
        # that, not the raw iteration ratio vs a stall-stopped
        # baseline, is the preconditioner's value on this system
        assert float(res1) < 1e-5, (rank, float(res1))
        assert int(it1) < int(it0), (rank, int(it1), int(it0))
        iters.append(int(it1))
    # ...and more rank strictly helps (the inverse-based lifts FAILED
    # exactly this: rank 2048 stalled while 512 and 4096 converged)
    assert iters == sorted(iters, reverse=True), iters
    assert iters[-1] < int(it0) // 3, (iters, int(it0))


def test_rayleigh_nystrom_precond_high_condition_f32():
    """Landmark-sketch Rayleigh EVD (the IterativeGP/bbmm default) on the
    κ-stressed f32 system, with the construction END-TO-END in f32 (the
    Gaussian-sketch test above builds its sketch in the x64 default dtype;
    this one exercises exactly the TPU arithmetic). Without the SPD
    deflation cap this configuration DIVERGES outright: σ²/λmax ≈ 3e-7 is
    below the f32 orthonormality error of U, so the exact coefficient
    makes I − U·coef·Uᵀ indefinite (measured preconditioned eigenvalue
    −0.2, residual 1.1 after 1500 iters)."""
    from stpy_tpu.parallel import cg_solve, rayleigh_nystrom_precond

    rng = np.random.default_rng(73)
    n, d, s = 1536, 2, 0.02
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    sq = jnp.maximum(jnp.sum(x * x, 1)[:, None] + jnp.sum(x * x, 1)[None, :]
                     - 2 * x @ x.T, 0)
    K = jnp.exp(-sq / (2 * 0.7 * 0.7)) + jnp.exp(
        -jnp.sqrt(sq + 1e-12) / 1.1)
    A = K + jnp.float32(s * s) * jnp.eye(n, dtype=jnp.float32)
    yv = jnp.sin(3 * x[:, 0]).astype(jnp.float32)

    mv = lambda v: A @ v
    mm = lambda V: A @ V
    _, it0, res0 = cg_solve(mv, yv, tol=1e-6, maxiter=1500)
    # unpreconditioned CG cannot reach tol on this system: the r4
    # stagnation stop ends it honestly at its f32 floor (measured:
    # 700 iters, residual 9.7e-6) instead of wandering toward maxiter
    assert float(res0) > 1e-6, float(res0)
    assert int(it0) < 1500, int(it0)

    iters = []
    for rank in (96, 192, 384):
        idx = np.asarray(
            rng.choice(n, rank, replace=False), np.int32)
        C = K[:, idx]
        assert C.dtype == jnp.float32
        M_inv = rayleigh_nystrom_precond(C, mm, jnp.float32(s))
        sol, it1, res1 = cg_solve(mv, yv, M_inv=M_inv, tol=1e-6,
                                  maxiter=1500)
        # every rank CONVERGES BELOW TOL — the value of the
        # preconditioner here is reaching the tolerance the bare f32
        # solve cannot, not merely fewer iterations (the pre-cap
        # construction diverged outright on this system)
        assert float(res1) < 1e-6, (rank, float(res1))
        iters.append(int(it1))
    # ... more rank strictly helps, and the largest rank accelerates hard
    assert iters == sorted(iters, reverse=True), iters
    assert iters[-1] < int(it0) // 2, (iters, int(it0))


def test_iterative_gp_fit_status_flags():
    """IterativeGP reports failure-detection flags (SURVEY §5): a
    converged fit sets converged=True with the CG stats; a maxiter-capped
    f32 fit warns and sets converged=False; the double tier records its
    exact per-step df residuals instead of warning (refinement absorbs a
    loose inner solve)."""
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(3)
    n, d = 200, 2
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=d)

    gp = IterativeGP(k, s=0.3, lazy=True, tol=1e-6, maxiter=500)
    gp.fit_gp(x, y)
    st = gp.fit_status
    assert st["converged"] is True and st["cg_residual"] <= 1e-6
    assert st["n"] == n and st["precision"] == "single"
    assert st["df_residuals"] is None

    with pytest.warns(UserWarning, match="hit maxiter"):
        gp_bad = IterativeGP(k, s=0.3, lazy=True, tol=1e-14, maxiter=3)
        gp_bad.fit_gp(x, y)
    assert gp_bad.fit_status["converged"] is False
    assert gp_bad.fit_status["cg_iterations"] == 3

    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")          # double must NOT warn
        # loose-but-converged inner solve: refinement contracts at rate
        # ~ the inner solve's relative error (~1e-3 per step here)
        gp_df = IterativeGP(k, s=0.3, lazy=True, tol=1e-3, maxiter=200,
                            precision="double", df_refine_steps=2,
                            df_chunk=64)
        gp_df.fit_gp(x, y)
    st = gp_df.fit_status
    assert st["precision"] == "double"
    assert len(st["df_residuals"]) == 2
    # refinement really contracted the exact residual
    assert st["df_residuals"][1] < st["df_residuals"][0]


def test_block_cg_variance_all_tiers_and_auto_rank():
    """VERDICT r3 task 8: mean_std's exact variance runs one block CG per
    128-column chunk on EVERY tier (lazy single-chip, lazy+mesh, dense
    single-chip, dense mesh) — never a per-point vmapped CG — and all four
    agree with the dense Cholesky GP. Also pins the auto precond-rank
    schedule (0 up to 16k, the measured rank-512 beyond)."""
    from jax.sharding import Mesh

    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.parallel import IterativeGP
    from stpy_tpu.parallel.iterative import resolve_precond_rank

    assert resolve_precond_rank("auto", 4096) == 0
    assert resolve_precond_rank("auto", 16384) == 0
    assert resolve_precond_rank("auto", 16385) == 512
    assert resolve_precond_rank(7, 100000) == 7
    assert resolve_precond_rank(0, 100000) == 0

    rng = np.random.default_rng(3)
    n, d, s = 192, 2, 0.2
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]))
    xt = jnp.asarray(rng.uniform(-1, 1, (40, d)))

    def mk():
        return KernelFunction(kernel_name="squared_exponential", gamma=0.6,
                              d=d)

    ref = GaussianProcess(kernel=mk(), s=s)
    ref.fit_gp(x, y)
    mu_ref, sd_ref = ref.mean_std(xt)

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    tiers = {
        "lazy": IterativeGP(mk(), s=s, lazy=True, tol=1e-10, maxiter=600),
        "lazy_mesh": IterativeGP(mk(), s=s, lazy=True, mesh=mesh,
                                 tol=1e-10, maxiter=600),
        "dense": IterativeGP(mk(), s=s, tol=1e-10, maxiter=600),
        "dense_mesh": IterativeGP(mk(), s=s, mesh=mesh, tol=1e-10,
                                  maxiter=600),
        # general (chunked) tier on a mesh: product kernel has no fused atom
        "chunked_mesh": IterativeGP(
            KernelFunction(kernel_name="squared_exponential", gamma=0.6,
                           d=d) * KernelFunction(kernel_name="matern",
                                                 gamma=1.1, nu=2.5, d=d),
            s=s, lazy=True, mesh=mesh, tol=1e-10, maxiter=600, chunk=64),
    }
    ref_prod = None
    for name, gp in tiers.items():
        gp.fit_gp(x, y)
        mu, sd = gp.mean_std(xt, method="exact")
        if name == "chunked_mesh":
            if ref_prod is None:
                rp = GaussianProcess(kernel=tiers["chunked_mesh"]
                                     .kernel_object, s=s)
                rp.fit_gp(x, y)
                ref_prod = rp.mean_std(xt)
            mu_r, sd_r = ref_prod
        else:
            mu_r, sd_r = mu_ref, sd_ref
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r),
                                   atol=5e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_r),
                                   atol=5e-6, err_msg=name)


def test_cg_stagnation_stop_and_segmented_solvers():
    """r4 65k-defaults regressions: (1) an f32 CG with tol below the
    matvec noise floor must STOP at the floor (stagnation detector)
    instead of burning maxiter; (2) the segmented solvers (host loop of
    bounded device programs — the monolithic 65k program killed the TPU
    worker) must match the monolithic result and stop early at the
    floor, returning the best iterate."""
    from stpy_tpu.parallel.iterative import (cg_solve, cg_solve_block,
                                             cg_solve_block_segmented,
                                             cg_solve_segmented)

    rng = np.random.default_rng(5)
    n, r = 512, 32
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    A = jnp.asarray(Q @ np.diag(rng.uniform(0.5, 80, n)) @ Q.T,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    mv, mm = (lambda v: A @ v), (lambda V: A @ V)

    # (1) unreachable tol: the f32 floor here is ~1e-7 relative; the
    # detector must end the solve long before maxiter
    x, it, res = cg_solve(mv, b, tol=1e-30, maxiter=100000)
    assert int(it) < 1000, int(it)
    assert float(res) < 1e-5, float(res)

    # f64 systems keep the old semantics (no detector): reachable tol
    x64, it64, res64 = cg_solve(lambda v: jnp.asarray(A, jnp.float64) @ v,
                                jnp.asarray(b, jnp.float64), tol=1e-12,
                                maxiter=100000)
    assert float(res64) <= 1e-12

    # (2) segmented == monolithic quality at a reachable tol
    X1, _ = cg_solve_block(mm, B, tol=1e-6, maxiter=2000)
    X2, it2 = cg_solve_block_segmented(mm, B, tol=1e-6, maxiter=2000,
                                       segment=40)
    r1 = float(jnp.linalg.norm(A @ X1 - B) / jnp.linalg.norm(B))
    r2 = float(jnp.linalg.norm(A @ X2 - B) / jnp.linalg.norm(B))
    assert r2 < max(3 * r1, 3e-6), (r1, r2)

    # floor case: stops early, best iterate is still floor-accurate
    X3, it3 = cg_solve_block_segmented(mm, B, tol=1e-30, maxiter=100000,
                                       segment=40)
    assert int(it3) < 2000, int(it3)
    r3 = float(jnp.linalg.norm(A @ X3 - B) / jnp.linalg.norm(B))
    assert r3 < 1e-5, r3

    xs, its, ress = cg_solve_segmented(mv, b, tol=1e-6, maxiter=2000,
                                       segment=40)
    assert float(ress) < 3e-6, float(ress)
