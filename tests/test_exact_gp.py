import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess


def _np_posterior(x, y, xt, gamma, s):
    """Plain-numpy float64 exact-GP posterior (the torch reference formulas,
    gauss_procc.py:136-399, without torch)."""
    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2 / gamma**2)

    K = k(x, x) + s**2 * np.eye(len(x))
    Ks = k(xt, x)
    alpha = np.linalg.solve(K, y)
    mu = Ks @ alpha
    var = 1.0 - np.einsum("ij,ji->i", Ks, np.linalg.solve(K, Ks.T))
    return mu, np.sqrt(np.maximum(var, 0))


@pytest.fixture
def data1d():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (40, 1))
    y = np.sin(3 * x) + 0.05 * rng.standard_normal((40, 1))
    xt = np.linspace(-1, 1, 64)[:, None]
    return x, y, xt


def test_posterior_matches_reference_formulas(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)
    mu_ref, std_ref = _np_posterior(x, y, xt, 0.5, 0.1)
    # north-star: posterior matches the reference to 1e-6 rtol (x64 on CPU)
    assert np.allclose(mu[:, 0], mu_ref[:, 0], rtol=1e-6, atol=1e-8)
    assert np.allclose(std[:, 0], std_ref, rtol=1e-6, atol=1e-7)


def test_full_covariance_consistent_with_diag(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    mu_d, std = gp.mean_std(xt)
    mu_f, cov = gp.mean_std(xt, full=True)
    assert np.allclose(mu_d, mu_f, atol=1e-10)
    assert np.allclose(np.diagonal(cov), std[:, 0] ** 2, atol=1e-8)


def test_unfitted_prior(data1d):
    _, _, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    mu, std = gp.mean_std(xt)
    assert np.allclose(mu, 0.0)
    assert np.allclose(std, 1.0, atol=1e-10)


def test_log_marginal_matches_closed_form(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    neg_lml = float(gp.log_marginal(gp.kernel_object, {}, 1.0))
    # closed form (without 2pi constant, matching estimator.py:32)
    K = np.asarray(gp.kernel_object.gram(x)) + 0.01 * np.eye(len(x))
    sign, logdet = np.linalg.slogdet(K)
    ref = 0.5 * (y.T @ np.linalg.solve(K, y))[0, 0] + 0.5 * logdet
    assert neg_lml == pytest.approx(ref, rel=1e-5)


def test_evidence_optimization_improves_and_recovers_scale(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=2.5, s=0.05, d=1)
    gp.fit_gp(x, y)
    before = float(gp.log_marginal(gp.kernel_object, {}, 1.0))
    gp.optimize_params(type="bandwidth", restarts=4, verbose=False)
    after = float(gp.log_marginal(gp.kernel_object, {}, 1.0))
    assert after <= before + 1e-8
    g = float(gp.kernel_object.params_dict["0"]["gamma"])
    assert 0.05 < g < 1.5  # sin(3x) has lengthscale well below 2.5


def test_optimize_bandwidth_and_noise(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=1.0, s=0.2, d=1)
    gp.fit_gp(x, y)
    gp.optimize_params(type="bandwidth+noise", restarts=3)
    assert float(gp.s) > 0
    assert float(gp.s) < 0.2  # true noise 0.05


def test_sample_statistics(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    f = gp.sample(xt, size=2000, key=jax.random.PRNGKey(0))
    mu, std = gp.mean_std(xt)
    emp_mu = jnp.mean(f, axis=1)
    emp_std = jnp.std(f, axis=1)
    assert np.allclose(emp_mu, mu[:, 0], atol=0.1)
    assert np.allclose(emp_std, std[:, 0], atol=0.1)


def test_ucb_lcb_order(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    assert bool(jnp.all(gp.ucb(xt) >= gp.lcb(xt)))


def test_ucb_optimize_finds_max(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1, bounds=[[-1.0, 1.0]])
    gp.fit_gp(x, y)
    pt, val = gp.ucb_optimize(beta=2.0, multistart=8)
    # sin(3x) max on [-1,1] at x = pi/6 ~ 0.5236
    assert abs(float(pt[0]) - np.pi / 6) < 0.15
    grid = np.linspace(-1, 1, 200)[:, None]
    assert float(val) >= float(jnp.max(gp.ucb(grid))) - 1e-2


def test_add_data_point_refits(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x[:30], y[:30])
    gp.add_data_point(x[30:], y[30:])
    mu, _ = gp.mean_std(xt)
    gp2 = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp2.fit_gp(x, y)
    mu2, _ = gp2.mean_std(xt)
    assert np.allclose(mu, mu2, atol=1e-8)


def test_huber_loss_robust_to_outliers(data1d):
    x, y, xt = data1d
    y_corrupt = np.array(y)
    y_corrupt[5] += 30.0  # gross outlier
    gp_sq = GaussianProcess(gamma=0.5, s=0.1, d=1, lam=0.5)
    gp_sq.fit_gp(x, y_corrupt)
    gp_hub = GaussianProcess(gamma=0.5, s=0.1, d=1, loss="huber", lam=0.5)
    gp_hub.fit_gp(x, y_corrupt)
    clean_mu, _ = _np_posterior(x, y, xt, 0.5, 0.1)
    err_sq = np.abs(np.asarray(gp_sq.mean(xt))[:, 0] - clean_mu[:, 0]).max()
    err_hub = np.abs(np.asarray(gp_hub.mean(xt))[:, 0] - clean_mu[:, 0]).max()
    assert err_hub < err_sq


def test_map_log_marginal_runs_and_differentiable(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1, loss="huber")
    gp.fit_gp(x, y)
    val = gp.log_marginal(gp.kernel_object, {}, 1.0)
    assert np.isfinite(float(val))

    def f(g):
        return gp.log_marginal(
            gp.kernel_object, {"0": {"gamma": g}}, 1.0
        )

    grad = jax.grad(f)(jnp.asarray(0.5))
    assert np.isfinite(float(grad))


def test_kernel_algebra_gp(data1d):
    """GP with k1*k2 + k3 composite kernel fits and predicts."""
    x, y, xt = data1d
    k = (
        KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
        * KernelFunction(kernel_name="polynomial", power=2, d=1)
        + KernelFunction(kernel_name="linear", d=1)
    )
    gp = GaussianProcess(kernel=k, s=0.1)
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)
    assert mu.shape == (64, 1) and bool(jnp.all(jnp.isfinite(std)))


def test_mean_gradient(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    pt = np.array([0.3])
    g = gp.mean_gradient_hessian(pt)
    eps = 1e-5
    fd = (
        float(gp.mean(np.array([[0.3 + eps]]))[0, 0])
        - float(gp.mean(np.array([[0.3 - eps]]))[0, 0])
    ) / (2 * eps)
    assert float(g[0]) == pytest.approx(fd, rel=1e-4)


def test_volume_mean_robust_to_band_outliers(data1d):
    """volume_mean should ignore points that sit outside the eps-band of the
    bulk (adversarial corruption)."""
    x, y, xt = data1d
    y_corrupt = np.array(y)
    y_corrupt[3] += 5.0
    y_corrupt[17] -= 5.0
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y_corrupt)
    vm = np.asarray(gp.volume_mean(xt, eps=0.2, scale=1e-3))
    clean_mu, _ = _np_posterior(x, y, xt, 0.5, 0.1)
    # the robust mean should track the clean signal better than the
    # corrupted ridge mean
    ridge_mu = np.asarray(gp.mean(xt))
    err_vm = np.abs(vm[:, 0] - clean_mu[:, 0]).mean()
    err_ridge = np.abs(ridge_mu[:, 0] - clean_mu[:, 0]).mean()
    assert err_vm < err_ridge
    # logistic relax also runs
    vm2 = np.asarray(gp.volume_mean(xt, eps=0.2, scale=1e-3, relax="log"))
    assert np.all(np.isfinite(vm2))


def test_posterior_matches_torch_reference(data1d):
    """North-star check against literal torch float64 reference formulas
    (the reference's compute path: torch.linalg solves on K = k(X,X)+s²I)."""
    import torch

    x, y, xt = data1d
    gamma, s = 0.5, 0.1
    tx = torch.from_numpy(x).double()
    ty = torch.from_numpy(y).double()
    txt = torch.from_numpy(xt).double()

    def tk(a, b):
        d2 = torch.cdist(a, b, p=2) ** 2
        return torch.exp(-0.5 * d2 / gamma**2)

    K = tk(tx, tx) + s**2 * torch.eye(len(x), dtype=torch.float64)
    Ks = tk(txt, tx)
    alpha = torch.linalg.solve(K, ty)
    mu_t = (Ks @ alpha).numpy()
    V = torch.linalg.solve(K, Ks.T)
    var_t = (1.0 - torch.einsum("ij,ji->i", Ks, V)).numpy()
    std_t = np.sqrt(np.maximum(var_t, 0))

    gp = GaussianProcess(gamma=gamma, s=s, d=1)
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)
    assert np.allclose(np.asarray(mu)[:, 0], mu_t[:, 0], rtol=1e-6, atol=1e-9)
    assert np.allclose(np.asarray(std)[:, 0], std_t, rtol=1e-6, atol=1e-8)


def test_sample_iteratively_max(data1d):
    x, y, xt = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1, bounds=[[-1.0, 1.0]])
    gp.fit_gp(x, y)
    # grid mode
    pt, val = gp.sample_iteratively_max(xt, key=jax.random.PRNGKey(0))
    assert -1 <= float(np.asarray(pt).ravel()[0]) <= 1
    # grid-free coordinate-wise mode (fantasy conditioning)
    n_before = gp.x.shape[0]
    pt2, val2 = gp.sample_iteratively_max(
        None, multistart=2, grid=16, key=jax.random.PRNGKey(1)
    )
    assert gp.x.shape[0] == n_before  # data restored
    assert -1 <= float(pt2[0, 0]) <= 1


def test_fit_status_surfaced(data1d):
    x, y, _ = data1d
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x, y)
    assert gp.fit_status["cholesky_ok"] is True
    assert gp.fit_status["jitter_used"] >= 0
    assert gp.fit_status["n"] == 40


def test_online_gp_matches_batch_and_is_jit_stable(data1d):
    """Capacity-padded OnlineGP: posterior equals the batch GP at every step,
    and add/predict never recompile across steps."""
    from stpy_tpu.models.online_gp import OnlineGP
    from stpy_tpu.kernels import KernelFunction

    x, y, xt = data1d
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    og = OnlineGP(k, s=0.1, capacity=64, d=1)
    for i in range(25):
        og.add_data_point(x[i : i + 1], y[i : i + 1])
    mu_o, std_o = og.mean_std(xt)

    gp = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp.fit_gp(x[:25], y[:25])
    mu_b, std_b = gp.mean_std(xt)
    assert np.allclose(mu_o, mu_b, atol=1e-7)
    assert np.allclose(std_o, std_b, atol=1e-7)

    # jit stability: no retraces after the first add/predict
    n_traces_add = og._add_jit._cache_size()
    n_traces_pred = og._predict_jit._cache_size()
    og.add_data_point(x[25:26], y[25:26])
    og.mean_std(xt)
    assert og._add_jit._cache_size() == n_traces_add
    assert og._predict_jit._cache_size() == n_traces_pred


def test_composite_kernel_hyperopt(data1d):
    """Hyperopt must round-trip params of BOTH atoms of k1 + k2
    (SURVEY hard-part #4: kernel-algebra params into the optimizer)."""
    x, y, _ = data1d
    k = (
        KernelFunction(kernel_name="squared_exponential", gamma=2.0, d=1)
        + KernelFunction(kernel_name="squared_exponential", gamma=0.1, d=1)
    )
    gp = GaussianProcess(kernel=k, s=0.1)
    gp.fit_gp(x, y)
    before = float(gp.log_marginal(k, {}, 1.0))
    gp.optimize_params(type="bandwidth", restarts=4, maxiter=100)
    after = float(gp.log_marginal(k, {}, 1.0))
    assert after <= before + 1e-8
    g0 = float(k.params_dict["0"]["gamma"])
    g1 = float(k.params_dict["1"]["gamma"])
    # both atoms' lengthscales were written back and are positive
    assert g0 > 0 and g1 > 0
    assert (g0, g1) != (2.0, 0.1)


def test_fixed_jitter_fit_matches_ladder(data1d):
    """jitter_ladder=False (chol_jittered fit — the 32k-on-one-chip memory
    path, benchmarks/exp_32k.py) must match the ladder fit on a
    well-conditioned problem and still surface fit_status."""
    x, y, xt = data1d
    gp_l = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp_f = GaussianProcess(gamma=0.5, s=0.1, d=1, jitter_ladder=False)
    gp_l.fit_gp(x, y)
    gp_f.fit_gp(x, y)
    mu_l, sd_l = gp_l.mean_std(xt)
    mu_f, sd_f = gp_f.mean_std(xt)
    assert np.allclose(np.asarray(mu_l), np.asarray(mu_f), atol=1e-8)
    assert np.allclose(np.asarray(sd_l), np.asarray(sd_f), atol=1e-8)
    assert gp_f.fit_status["cholesky_ok"] is True


def test_recompute_ladder_matches_ladder(data1d):
    """jitter_ladder='recompute' (the ~2n²-residency escalating ladder for
    robust 32k single-chip fits) must match the carried-Gram ladder in both
    precision modes on a well-conditioned problem."""
    x, y, xt = data1d
    for kw in ({}, {"precision": "double"}):
        gp_l = GaussianProcess(gamma=0.5, s=0.1, d=1, **kw)
        gp_r = GaussianProcess(gamma=0.5, s=0.1, d=1,
                               jitter_ladder="recompute", **kw)
        gp_l.fit_gp(x, y)
        gp_r.fit_gp(x, y)
        mu_l, sd_l = gp_l.mean_std(xt)
        mu_r, sd_r = gp_r.mean_std(xt)
        assert np.allclose(np.asarray(mu_l), np.asarray(mu_r), atol=1e-8), kw
        assert np.allclose(np.asarray(sd_l), np.asarray(sd_r), atol=1e-8), kw
        assert gp_r.fit_status["cholesky_ok"] is True
        assert np.isclose(gp_r.fit_status["jitter_used"],
                          gp_l.fit_status["jitter_used"], rtol=1e-6), kw
    with pytest.raises(ValueError):
        GaussianProcess(jitter_ladder="sometimes")


def test_fold_noise_matches_standard_double(data1d):
    """fold_noise=True (r5 — s²+jitter folded exactly into the df Gram
    diagonal, cutting dense-double fit peak from 4n² to 3n² buffers so
    n=32k fits one chip) must reproduce the standard double-tier posterior:
    the fold/unfold TwoSum sequence is error-free, so the factorized system
    and the refinement target are value-identical."""
    x, y, xt = data1d
    for vr in (0, 1):
        gp_s = GaussianProcess(gamma=0.5, s=0.1, d=1, precision="double",
                               var_refine=vr, jitter_ladder=False)
        gp_f = GaussianProcess(gamma=0.5, s=0.1, d=1, precision="double",
                               var_refine=vr, jitter_ladder=False,
                               fold_noise=True)
        gp_s.fit_gp(x, y)
        gp_f.fit_gp(x, y)
        mu_s, sd_s = gp_s.mean_std(xt)
        mu_f, sd_f = gp_f.mean_std(xt)
        assert np.allclose(np.asarray(mu_s), np.asarray(mu_f),
                           atol=1e-10), vr
        assert np.allclose(np.asarray(sd_s), np.asarray(sd_f),
                           atol=1e-10), vr
        assert gp_f.fit_status["cholesky_ok"] is True
        # the fused serving call takes the same branch
        mu2, sd2 = gp_f.fit_predict(x, y, xt)
        assert np.allclose(np.asarray(mu2), np.asarray(mu_f), atol=1e-12)
        assert np.allclose(np.asarray(sd2), np.asarray(sd_f), atol=1e-12)
    with pytest.raises(ValueError):
        GaussianProcess(fold_noise=True)                # needs double
    with pytest.raises(ValueError):
        GaussianProcess(precision="double", fold_noise=True)  # needs fixed j


def test_recompute_ladder_escalates_like_safe_cholesky():
    """On an indefinite matrix both ladders must escalate through the same
    rungs and land on the same jitter/factor."""
    from stpy_tpu.linalg import safe_cholesky, safe_cholesky_rebuild

    rng = np.random.default_rng(0)
    n = 12
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(1.0, 0.1, n)
    lam[-1] = -1e-9          # forces retries until j*scale > 1e-9
    K = jnp.asarray(Q @ np.diag(lam) @ Q.T)
    ref = safe_cholesky(K)
    reb = safe_cholesky_rebuild(
        lambda j: K + j * jnp.eye(n, dtype=K.dtype),
        jnp.mean(jnp.diagonal(K)),
    )
    assert bool(ref.ok) and bool(reb.ok)
    assert float(ref.jitter) > 1e-9          # it really escalated
    assert np.isclose(float(ref.jitter), float(reb.jitter), rtol=1e-12)
    assert np.allclose(np.asarray(ref.L), np.asarray(reb.L), atol=1e-12)


def test_fit_predict_fused_matches_two_call(data1d):
    """fit_predict (one compiled program — the serving path) must be
    BIT-identical to fit_gp + mean_std in every precision mode, and must
    leave the object in the same fitted state."""
    x, y, xt = data1d
    for kw in ({}, {"precision": "double"},
               {"precision": "double", "var_refine": 1}):
        gp_a = GaussianProcess(gamma=0.5, s=0.1, d=1, **kw)
        gp_a.fit_gp(x, y)
        mu_a, sd_a = gp_a.mean_std(xt)
        gp_b = GaussianProcess(gamma=0.5, s=0.1, d=1, **kw)
        mu_b, sd_b = gp_b.fit_predict(x, y, xt)
        assert np.array_equal(np.asarray(mu_a), np.asarray(mu_b)), kw
        assert np.array_equal(np.asarray(sd_a), np.asarray(sd_b)), kw
        # post-call state drives the stateful API identically
        mu_c, sd_c = gp_b.mean_std(xt)
        assert np.array_equal(np.asarray(mu_a), np.asarray(mu_c)), kw
        assert gp_b.fit_status["cholesky_ok"] is True


def test_sigma_fit_status_and_double_raise(data1d):
    """Per-point Sigma fits must surface fit_status and honor
    jitter_ladder=False; precision='double' must RAISE (the df pipeline
    models isotropic s only — a silent fallthrough previously paired a
    stale df alpha with the new factor)."""
    x, y, xt = data1d
    n = x.shape[0]
    Sigma = 0.1 * jnp.eye(n)
    gp = GaussianProcess(gamma=0.5, s=0.1, d=1, jitter_ladder=False)
    gp.fit_gp(x, y, Sigma=Sigma)
    assert gp.fit_status["cholesky_ok"] is True
    assert gp.fit_status["n"] == n
    mu, sd = gp.mean_std(xt)
    assert np.all(np.isfinite(np.asarray(mu)))

    gpd = GaussianProcess(gamma=0.5, s=0.1, d=1, precision="double")
    import pytest
    with pytest.raises(NotImplementedError):
        gpd.fit_gp(x, y, Sigma=Sigma)


def test_gradient_helpers_double_mode(data1d):
    """gradient_mean_var / mean_gradient_hessian must work in double mode
    (they now differentiate a stored-factor closed form, not the df
    Pallas predict, which has no VJP on TPU) and agree with the
    single-mode gradients."""
    x, y, xt = data1d
    pt = np.asarray(xt)[0]
    gp_s = GaussianProcess(gamma=0.5, s=0.1, d=1)
    gp_s.fit_gp(x, y)
    g_s = np.asarray(gp_s.gradient_mean_var(pt, hessian=False))
    gp_d = GaussianProcess(gamma=0.5, s=0.1, d=1, precision="double")
    gp_d.fit_gp(x, y)
    g_d = np.asarray(gp_d.gradient_mean_var(pt, hessian=False))
    assert np.allclose(g_s, g_d, rtol=1e-4, atol=1e-7)
    nab, H = gp_d.gradient_mean_var(pt, hessian=True)
    assert np.all(np.isfinite(np.asarray(H)))
    g2 = np.asarray(gp_d.mean_gradient_hessian(pt))
    assert np.allclose(g2, g_d, rtol=1e-6)


def test_newton_hyperopt_matches_lbfgs(data1d):
    """r4 (VERDICT r3 task 4): dim <= 2 hyperfits route to exact-Hessian
    damped Newton (~7-9 iterations) instead of the vmapped L-BFGS (~40
    worst-lane iterations x 12-candidate batches). The done-bar demands
    IDENTICAL fitted optima — pin the two paths against each other (a
    zero regularizer forces the L-BFGS route)."""
    x, y, _ = data1d
    gp = GaussianProcess(gamma=1.0, s=0.05, d=1)
    gp.fit_gp(x, y)
    gp.optimize_params(type="bandwidth", restarts=6, maxiter=40)
    g_newton = float(gp.kernel_object.params_dict["0"]["gamma"])
    it_newton = gp.hyperopt_metrics["iterations"]
    assert gp.hyperopt_metrics["converged"].all()

    gp2 = GaussianProcess(gamma=1.0, s=0.05, d=1)
    gp2.fit_gp(x, y)
    gp2.optimize_params(type="bandwidth", restarts=6, maxiter=40,
                        regularizer=("lasso", 0.0))
    g_lbfgs = float(gp2.kernel_object.params_dict["0"]["gamma"])
    assert abs(g_newton - g_lbfgs) / g_lbfgs < 1e-3, (g_newton, g_lbfgs)
    # and it must actually be the fast path: single-digit iterations
    assert it_newton.max() <= 20, it_newton
