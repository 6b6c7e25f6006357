import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import BorelSet, HierarchicalBorelSets
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.point_processes import (
    BernoulliRateEstimator,
    PermanentalProcessRateEstimator,
    PoissonPointProcess,
    PoissonRateEstimator,
)


@pytest.fixture(scope="module")
def setup_1d():
    process = PoissonPointProcess(d=1, B=4.0, b=0.5)
    hierarchy = HierarchicalBorelSets(1, [[-1.0, 1.0]], levels=3)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.3, d=1)
    return process, hierarchy, k


def _sense_all(process, hierarchy, key, dt=10.0):
    """Sense every leaf set for duration dt."""
    data = []
    for S in hierarchy.get_sets_level(hierarchy.levels):
        key, sub = jax.random.split(key)
        obs = process.sample_discretized(sub, S, dt, n=64)
        data.append((S, obs, dt))
    return data, key


def test_simulator_count_statistics(setup_1d):
    process, hierarchy, _ = setup_1d
    S = hierarchy.top_node
    lam = process.rate_volume(S, dt=1.0)
    assert lam > 0
    key = jax.random.PRNGKey(0)
    counts = []
    for i in range(200):
        key, sub = jax.random.split(key)
        x = process.sample_discretized(sub, S, 1.0)
        counts.append(0 if x is None else x.shape[0])
    # Poisson mean check (200 trials): sample mean within 4 sigma
    assert abs(np.mean(counts) - lam) < 4 * np.sqrt(lam / 200)


def test_rate_volume_quadrature(setup_1d):
    process, _, _ = setup_1d
    S = BorelSet(1, [[-1.0, 1.0]])
    lam = process.rate_volume(S, dt=1.0)
    # dense Riemann check
    xs = np.linspace(-1, 1, 20001)[:, None]
    vals = np.asarray(process.rate(jnp.asarray(xs))).ravel()
    ref = np.trapezoid(vals, xs[:, 0])
    assert lam == pytest.approx(ref, rel=1e-6)


def test_poisson_rate_estimator_fit_recovers_rate(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=32, kernel_object=k, B=5.0, s=1e-4,
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(1), dt=50.0)
    est.load_data(data)
    est.fit_gp()
    D = hierarchy.top_node
    xtest = D.return_discretization(128)
    est_rate = np.asarray(est.mean_rate_points(xtest)).ravel()
    true_rate = np.asarray(process.rate(xtest)).ravel()
    # With dt=50 of sensing per leaf the MAP should track the truth
    rel_err = np.abs(est_rate - true_rate).mean() / true_rate.mean()
    assert rel_err < 0.3
    assert est_rate.min() > -1e-6  # positivity


def test_mean_set_consistency(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=32, kernel_object=k, B=5.0, s=1e-4,
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(2), dt=50.0)
    est.load_data(data)
    est.fit_gp()
    # integral over the whole domain = sum over leaves
    D = hierarchy.top_node
    total = float(est.mean_set(D)[0])
    parts = sum(
        float(est.mean_set(S)[0]) for S in hierarchy.get_sets_level(3)
    )
    assert total == pytest.approx(parts, rel=1e-5)


def test_ucb_lcb_bracket_map(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=0.1,
        uncertainty="laplace",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(3), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    S = hierarchy.get_sets_level(2)[0]
    map_ = float(est.mean_set(S)[0])
    ucb = float(est.ucb(S))
    lcb = float(est.lcb(S))
    assert lcb <= map_ + 1e-4
    assert ucb >= map_ - 1e-4
    assert ucb >= lcb


def test_ellipsoid_approx_ucb(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=0.1,
        approx="ellipsoid",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(4), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    S = hierarchy.get_sets_level(2)[1]
    map_ = float(est.mean_set(S)[0])
    ucb = float(est.ucb(S))
    lcb = float(est.lcb(S))
    assert lcb - 1e-6 <= map_ <= ucb + 1e-6


def test_least_squares_estimator(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=0.1,
        estimator="least-sq", uncertainty="least-sq", var_cor_on=False,
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(5), dt=50.0)
    est.load_data(data)
    est.fit_gp()
    xtest = hierarchy.top_node.return_discretization(64)
    est_rate = np.asarray(est.mean_rate_points(xtest)).ravel()
    true_rate = np.asarray(process.rate(xtest)).ravel()
    # least-sq sees only 4 aggregate leaf counts -> coarse reconstruction
    assert np.abs(est_rate - true_rate).mean() / true_rate.mean() < 0.65
    # but the per-leaf integrals must match the observed count rates
    for i, S in enumerate(hierarchy.get_sets_level(3)):
        pred = float(est.mean_set(S)[0])
        emp = float(est.total_bucketized_obs[i] / est.total_bucketized_time[i])
        assert pred == pytest.approx(emp, abs=0.35)


def test_histogram_feedback(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=0.1,
        feedback="histogram",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(6), dt=50.0)
    est.load_data(data)
    est.fit_gp()
    xtest = hierarchy.top_node.return_discretization(64)
    est_rate = np.asarray(est.mean_rate_points(xtest)).ravel()
    assert np.all(np.isfinite(est_rate))
    assert est_rate.min() > -1e-6


def test_posterior_sampling(setup_1d):
    process, hierarchy, k = setup_1d
    for sampling in ["proximal+prox", "mirror", "hessian", "mla_prime",
                     "newton"]:
        est = PoissonRateEstimator(
            process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
            sampling=sampling, steps=200,
        )
        data, _ = _sense_all(
            process, hierarchy, jax.random.PRNGKey(7), dt=20.0
        )
        est.load_data(data)
        est.fit_gp()
        est.sample()
        xtest = hierarchy.top_node.return_discretization(32)
        path = np.asarray(est.sample_path_points(xtest))
        assert np.all(np.isfinite(path)), sampling


def test_add_data_point_incremental(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
    )
    data, key = _sense_all(process, hierarchy, jax.random.PRNGKey(8), dt=10.0)
    est.load_data(data[:4])
    est.fit_gp()
    for d in data[4:]:
        est.add_data_point(d)
    est.fit_gp()
    assert est.n_rounds == len(data)
    # jit_pad: stored arrays are padded to the next power of 2
    assert est.phis.shape[0] >= len(data)
    assert np.all(np.isfinite(np.asarray(est.rate)))


def test_gap_and_information_acquisition(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
        approx="ellipsoid",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(9), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    actions = hierarchy.get_sets_level(2)
    w = lambda S: 1.0
    g = est.gap(actions[0], actions, w, dt=1.0)
    assert np.isfinite(g)
    info = est.information(actions[0], dt=1.0)
    assert np.isfinite(info)


def test_permanental_estimator(setup_1d):
    process, hierarchy, k = setup_1d
    est = PermanentalProcessRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(10), dt=30.0)
    est.load_data(data)
    est.fit_gp()
    xtest = hierarchy.top_node.return_discretization(64)
    r = np.asarray(est.mean_rate_points(xtest)).ravel()
    assert np.all(r >= 0)  # squared link is nonneg by construction
    # pointwise values of the squared link are spiky under a coarse basis;
    # the SET-level intensities are the meaningful check: per-leaf fitted
    # integrals must match the empirical count rates
    for i, S in enumerate(hierarchy.get_sets_level(3)):
        pred = float(est.mean_set(S))
        emp = float(
            est.total_bucketized_obs[i] / est.total_bucketized_time[i]
        )
        assert pred == pytest.approx(emp, abs=0.4)
    est.sample(steps=50)
    assert np.all(np.isfinite(np.asarray(est.sample_path_points(xtest))))


def test_bernoulli_estimator():
    hierarchy = HierarchicalBorelSets(1, [[-1.0, 1.0]], levels=3)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    est = BernoulliRateEstimator(
        hierarchy, d=1, m=16, kernel_object=k, s=0.05
    )
    true_p = lambda S: 0.2 + 0.5 * float(S.center_point()[0] > 0)
    key = jax.random.PRNGKey(0)
    data = []
    for S in hierarchy.get_sets_level(3):
        for _ in range(40):
            key, sub = jax.random.split(key)
            rv = float(jax.random.bernoulli(sub, true_p(S)))
            data.append((S, rv, 1.0, 1.0, None))
    est.load_data(data)
    est.fit_gp()
    # check estimated p on a positive-side and negative-side leaf
    for S in hierarchy.get_sets_level(3):
        p_hat = est.mean_set(S)
        assert abs(p_hat - true_p(S)) < 0.25
        assert est.lcb(S) - 0.3 <= p_hat <= est.ucb(S) + 0.3


def test_conformal_confidence_set(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=1e-3,
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(11), dt=5.0)
    # sense each leaf several times so conformal has history
    for rep in range(12, 16):
        more, _ = _sense_all(
            process, hierarchy, jax.random.PRNGKey(rep), dt=5.0
        )
        data.extend(more)
    est.load_data(data)
    est.fit_gp()
    S = hierarchy.get_sets_level(3)[1]
    map_, ucb, lcb = est.conformal_confidence_set(
        S, delta=0.2, max_val=30, dt=5.0, step=2
    )
    true_rate_set = process.rate_volume(S, dt=1.0) / S.volume()
    assert lcb <= ucb
    # the conformal interval (rates) should bracket the truth loosely
    assert lcb <= true_rate_set * 1.5
    assert ucb >= true_rate_set * 0.5


def test_mbr_estimator(setup_1d):
    from stpy_tpu.point_processes import MBRPositiveEstimator

    process, hierarchy, k = setup_1d
    est = MBRPositiveEstimator(
        process, hierarchy, d=1, m=8, kernel_object=k, B=5.0, s=0.1,
        psd=True,  # PSD parameterization guarantees a nonnegative rate
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(20), dt=30.0)
    est.load_data(data)
    est.fit_gp()
    xtest = hierarchy.top_node.return_discretization(32)
    r = np.asarray(est.mean_rate_points(xtest)).ravel()
    assert np.all(np.isfinite(r))
    # set-level intensities close to empirical
    for i, S in enumerate(hierarchy.get_sets_level(3)):
        pred = float(est.mean_set(S))
        emp = float(
            est.total_bucketized_obs[i] / est.total_bucketized_time[i]
        )
        assert pred == pytest.approx(emp, abs=0.6)
    ucb = est.ucb(hierarchy.get_sets_level(2)[0])
    assert np.isfinite(ucb)


def test_lr_pointwise_band(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=12, kernel_object=k, B=5.0, s=1e-2,
        feedback="histogram",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(21), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    D = hierarchy.top_node
    map_, lcb, ucb = est.map_lcb_ucb_likelihood_ratio(D, 8, delta=0.1)
    assert bool(jnp.all(ucb >= lcb - 1e-6))


def test_dual_anchor_mode(setup_1d):
    """Anchor-point compression: fit quality should be close to the primal
    fit while compressing observations onto the anchor grid."""
    process, hierarchy, k = setup_1d
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(30), dt=50.0)
    est_primal = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=1e-4,
    )
    est_primal.load_data(data)
    est_primal.fit_gp()

    est_dual = PoissonRateEstimator(
        process, hierarchy, d=1, m=24, kernel_object=k, B=5.0, s=1e-4,
        dual=True, no_anchor_points=64,
    )
    est_dual.load_data(data)
    assert float(jnp.sum(est_dual.anchor_weights)) > 0
    est_dual.fit_gp()
    xt = hierarchy.top_node.return_discretization(64)
    r_p = np.asarray(est_primal.mean_rate_points(xt)).ravel()
    r_d = np.asarray(est_dual.mean_rate_points(xt)).ravel()
    # anchor compression is an approximation; rates should broadly agree
    assert np.abs(r_p - r_d).mean() / (r_p.mean() + 1e-9) < 0.5


def test_beta_theory(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
        beta=-1.0,  # theory beta
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(31), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    est.W = est.construct_covariance_matrix_laplace()
    est.W_inv_approx = jnp.linalg.pinv(est.W)
    b = est.beta(0)
    assert np.isfinite(b) and b > 0


def test_rounds_with_no_observations(setup_1d):
    """Sensing rounds that observed nothing (obs=None) must contribute their
    integral term and not break the fit."""
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=1e-3,
    )
    leafs = hierarchy.get_sets_level(3)
    data = [(leafs[0], None, 5.0), (leafs[1], None, 5.0)]
    key = jax.random.PRNGKey(40)
    for S in leafs[2:]:
        key, sub = jax.random.split(key)
        data.append((S, process.sample_discretized(sub, S, 20.0, n=64), 20.0))
    est.load_data(data)
    est.fit_gp()
    xt = hierarchy.top_node.return_discretization(32)
    r = np.asarray(est.mean_rate_points(xt)).ravel()
    assert np.all(np.isfinite(r)) and r.min() > -1e-6
    # the unobserved leaves should get a LOW estimated rate
    left = r[np.asarray(xt).ravel() < -0.5].mean()
    right = r[np.asarray(xt).ravel() > 0.0].mean()
    assert left < right


def test_all_empty_data(setup_1d):
    """Only empty rounds: MAP should push the rate to the lower bound."""
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=12, kernel_object=k, B=5.0, s=1e-3,
    )
    data = [(S, None, 10.0) for S in hierarchy.get_sets_level(3)]
    est.load_data(data)
    est.fit_gp()
    xt = hierarchy.top_node.return_discretization(16)
    r = np.asarray(est.mean_rate_points(xt)).ravel()
    assert r.max() < 0.3  # near the lower bound b=0


def test_jit_pad_fit_matches_unpadded_and_bounds_recompiles(setup_1d):
    from stpy_tpu.point_processes.poisson_rate_estimator import (
        _map_count_record_lbfgs,
    )

    process, hierarchy, k = setup_1d
    data, key = _sense_all(process, hierarchy, jax.random.PRNGKey(11),
                           dt=20.0)

    est_p = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
        jit_pad=True,
    )
    est_u = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
        jit_pad=False,
    )
    est_p.load_data(data)
    est_u.load_data(data)
    est_p.fit_gp()
    est_u.fit_gp()
    # padded rounds/observations carry zero weight: identical MAP
    assert np.allclose(np.asarray(est_p.rate), np.asarray(est_u.rate),
                       atol=1e-6)

    # sensing loop: rounds 5..10 all fit at padded size 16 -> the jitted MAP
    # runner compiles at most once per power-of-2 bucket, not per round
    cache0 = _map_count_record_lbfgs._cache_size()
    S = hierarchy.get_sets_level(hierarchy.levels)[0]
    for i in range(4):
        key, sub = jax.random.split(key)
        obs = process.sample_discretized(sub, S, 20.0, n=64)
        est_p.add_data_point((S, obs, 20.0))
        est_p.fit_gp()
    grown = _map_count_record_lbfgs._cache_size() - cache0
    assert grown <= 3, f"MAP runner recompiled {grown}x in 4 rounds"


def test_batched_ucb_matches_per_action(setup_1d):
    process, hierarchy, k = setup_1d
    est = PoissonRateEstimator(
        process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
        uncertainty="laplace",
    )
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(14), dt=20.0)
    est.load_data(data)
    est.fit_gp()
    actions = hierarchy.get_sets_level(2)
    maps, ucbs, lcbs = est.ucb_lcb_actions(actions, dt=1.0)
    for i, S in enumerate(actions):
        assert float(ucbs[i]) == pytest.approx(float(est.ucb(S)), rel=1e-6)
        assert float(lcbs[i]) == pytest.approx(float(est.lcb(S)), rel=1e-6,
                                               abs=1e-8)


def test_histogram_jit_pad_matches_unpadded(setup_1d):
    process, hierarchy, k = setup_1d
    data, _ = _sense_all(process, hierarchy, jax.random.PRNGKey(15), dt=20.0)

    rates = {}
    for pad in (True, False):
        est = PoissonRateEstimator(
            process, hierarchy, d=1, m=16, kernel_object=k, B=5.0, s=0.1,
            feedback="histogram", jit_pad=pad,
        )
        est.load_data(data)
        est.fit_gp()
        est.update_variances()
        W = est.construct_covariance_matrix_laplace()
        rates[pad] = (np.asarray(est.rate), np.asarray(W))

    assert np.allclose(rates[True][0], rates[False][0], atol=1e-8)
    assert np.allclose(rates[True][1], rates[False][1], atol=1e-6)


def test_poisson_map_f32_matches_f64(tmp_path):
    """f32/f64 MAP agreement on IDENTICAL data (VERDICT r1 item 4: config 4
    showed a 21% f32-vs-f64 gap; root cause was the f32 pinv/symsqrt chain
    in PositiveEmbedding.cov(), now computed on host in float64). x64 is
    process-global, so each precision runs in a subprocess."""
    import os
    import subprocess
    import sys as _sys

    script = tmp_path / "fit.py"
    script.write_text(
        """
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
if sys.argv[1] == 'f64':
    jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from stpy_tpu.domains import HierarchicalBorelSets
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.point_processes import PoissonPointProcess, PoissonRateEstimator

hierarchy = HierarchicalBorelSets(1, [[-1.0, 1.0]], levels=2)
k = KernelFunction(kernel_name='squared_exponential', gamma=0.3, d=1)
process = PoissonPointProcess(d=1, B=4.0, b=0.5)
est = PoissonRateEstimator(process, hierarchy, d=1, m=12, kernel_object=k,
                           B=5.0, s=1e-3)
rng = np.random.default_rng(7)
data = []
for S in hierarchy.get_sets_level(2):
    b = np.asarray(S.bounds)
    m_ = rng.poisson(4.0 * float(b[0, 1] - b[0, 0]) * 20.0)
    pts = rng.uniform(b[0, 0], b[0, 1], (m_, 1))
    keep = rng.uniform(0, 1, m_) < ((2.0 + np.cos(3 * pts[:, 0])) / 4.0)
    obs = jnp.asarray(pts[keep].astype(np.float32))
    data.append((S, obs if obs.shape[0] else None, 20.0))
est.load_data(data)
est.fit_gp()
print('TOTAL', float(est.mean_set(hierarchy.top_node)[0]))
"""
    )
    env = dict(os.environ)
    import stpy_tpu

    repo = os.path.dirname(os.path.dirname(stpy_tpu.__file__))
    env["PYTHONPATH"] = (
        env.get("PYTHONPATH", "") + os.pathsep + repo
    ).lstrip(os.pathsep)

    def run(prec):
        out = subprocess.run(
            [_sys.executable, str(script), prec], env=env,
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("TOTAL")]
        return float(line[0].split()[1])

    t32, t64 = run("f32"), run("f64")
    assert abs(t32 - t64) / abs(t64) < 5e-3, (t32, t64)
