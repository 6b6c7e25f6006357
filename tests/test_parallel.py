import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.parallel import (
    distributed_evidence,
    make_mesh,
    restart_farm,
    sharded_gram,
    shard_rows,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must create 8 virtual devices"
    return make_mesh((1, 8), ("dp", "tp"))


def test_sharded_gram_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 3)))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.7, d=3)
    xs = shard_rows(x, mesh8, "tp")
    with mesh8:
        K = sharded_gram(
            lambda a, b: k.eval_params(k.params_dict, a, b), xs, mesh8, "tp"
        )
    K_ref = k.gram(x)
    assert np.allclose(K, K_ref, atol=1e-10)


def test_distributed_evidence_matches_single_device(mesh8):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, :1]))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    nll = distributed_evidence(k, mesh8, "tp")
    with mesh8:
        xs = jax.device_put(x, NamedSharding(mesh8, P("tp", None)))
        ys = jax.device_put(y, NamedSharding(mesh8, P("tp", None)))
        val = jax.jit(
            lambda pd, s, x, y: nll(pd, s, x, y)
        )(k.params_dict, 0.1, xs, ys)
    # single-device reference
    from stpy_tpu.models import GaussianProcess

    gp = GaussianProcess(kernel=k, s=0.1)
    gp.x, gp.y = x, y
    ref = gp.log_marginal_params(k, {}, 0.1)
    assert float(val) == pytest.approx(float(ref), rel=1e-8)


def test_distributed_evidence_gradient(mesh8):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (32, 1)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1)
    nll = distributed_evidence(k, mesh8, "tp")
    with mesh8:
        xs = jax.device_put(x, NamedSharding(mesh8, P("tp", None)))
        ys = jax.device_put(y, NamedSharding(mesh8, P("tp", None)))

        def f(g):
            return nll({"0": {"gamma": g}}, 0.1, xs, ys)

        g0 = jnp.asarray(0.5)
        grad = jax.jit(jax.grad(f))(g0)
        eps = 1e-6
        fd = (f(g0 + eps) - f(g0 - eps)) / (2 * eps)
    assert float(grad) == pytest.approx(float(fd), rel=1e-4)


def test_restart_farm_shards_batch(mesh8):
    def work(theta):
        return jnp.sum(theta**2)

    farm = restart_farm(work, 8, mesh8, "dp")
    # dp axis has size 1 in this mesh; build a dp-major mesh instead
    mesh_dp = make_mesh((8, 1), ("dp", "tp"))
    farm = restart_farm(work, 8, mesh_dp, "dp")
    batch = jnp.arange(8.0)[:, None] * jnp.ones((8, 4))
    with mesh_dp:
        out = farm((batch,))
    assert out.shape == (8,)
    assert np.allclose(out, np.sum(np.asarray(batch) ** 2, axis=1))


def test_graft_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[2].shape[0]
    g.dryrun_multichip(8)


def test_cg_solve_matches_direct():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((40, 40))
    A = A @ A.T + 40 * np.eye(40)
    b = rng.standard_normal(40)
    from stpy_tpu.parallel import cg_solve

    x, it, res = cg_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                          tol=1e-10)
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-6)
    assert float(res) < 1e-8


def test_iterative_gp_matches_cholesky_gp(mesh8):
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (64, 1))
    y = np.sin(3 * x) + 0.05 * rng.standard_normal((64, 1))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    xt = np.linspace(-1, 1, 32)[:, None]

    gp = GaussianProcess(kernel=k, s=0.1)
    gp.fit_gp(x, y)
    mu_ref, std_ref = gp.mean_std(xt)

    with mesh8:
        igp = IterativeGP(k, s=0.1, mesh=mesh8, axis="tp", tol=1e-10)
        igp.fit_gp(x, y)
        mu = igp.mean(xt)
    assert igp.cg_residual < 1e-8
    assert np.allclose(mu, mu_ref, atol=1e-6)

    # single-device fallback with probe variance
    igp2 = IterativeGP(k, s=0.1, mesh=None, tol=1e-10)
    igp2.fit_gp(x, y)
    mu2, std2 = igp2.mean_std(xt)  # exact per-column CG variance
    assert np.allclose(mu2, mu_ref, atol=1e-6)
    assert np.abs(np.asarray(std2) - np.asarray(std_ref)).max() < 1e-4


def test_iterative_gp_pathwise_sampling():
    from stpy_tpu.embeddings import HermiteEmbedding
    from stpy_tpu.parallel import IterativeGP
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (48, 1))
    y = np.sin(3 * x)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    igp = IterativeGP(k, s=0.1, tol=1e-10)
    igp.fit_gp(x, y)
    emb = HermiteEmbedding(gamma=0.4, m=64, d=1)
    xt = np.linspace(-1, 1, 24)[:, None]
    paths = igp.sample_pathwise(xt, emb, size=500, key=jax.random.PRNGKey(1))
    gp = GaussianProcess(kernel=k, s=0.1)
    gp.fit_gp(x, y)
    mu_ref, _ = gp.mean_std(xt)
    assert np.abs(jnp.mean(paths, axis=1) - mu_ref[:, 0]).max() < 0.15


def test_slq_logdet_matches_dense():
    from stpy_tpu.parallel.slq import slq_logdet, slq_trace_fn

    rng = np.random.default_rng(0)
    n = 200
    A = rng.standard_normal((n, n))
    A = A @ A.T / n + np.eye(n)
    Aj = jnp.asarray(A)
    ld_true = float(np.linalg.slogdet(A)[1])
    est, vals = slq_logdet(
        lambda v: Aj @ v, n, probes=64, lanczos_iters=40,
        key=jax.random.PRNGKey(0), dtype=Aj.dtype,
    )
    assert abs(float(est) - ld_true) / abs(ld_true) < 0.05
    tr_inv = slq_trace_fn(
        lambda v: Aj @ v, n, lambda w: 1.0 / w, probes=64,
        lanczos_iters=40, key=jax.random.PRNGKey(1), dtype=Aj.dtype,
    )
    assert abs(float(tr_inv) - np.trace(np.linalg.inv(A))) / n < 0.1


def test_evidence_matvec_only_matches_dense():
    from stpy_tpu.parallel.slq import evidence_matvec_only

    rng = np.random.default_rng(1)
    n = 128
    x = rng.uniform(-1, 1, (n, 1))
    y = np.sin(3 * x)
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    K = np.asarray(k.gram(x)) + 0.01 * np.eye(n)
    Kj = jnp.asarray(K)
    ref = 0.5 * float(y.T @ np.linalg.solve(K, y)) + 0.5 * float(
        np.linalg.slogdet(K)[1]
    )
    est = evidence_matvec_only(
        lambda v: Kj @ v, jnp.asarray(y), n, probes=64, lanczos_iters=50,
        key=jax.random.PRNGKey(2),
    )
    assert abs(float(est) - ref) / abs(ref) < 0.08


def test_slq_with_sharded_matvec(mesh8):
    """SLQ logdet through the row-sharded matvec — distributed evidence."""
    from stpy_tpu.parallel import IterativeGP
    from stpy_tpu.parallel.slq import slq_logdet

    rng = np.random.default_rng(2)
    n = 64
    x = rng.uniform(-1, 1, (n, 1))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.4, d=1)
    with mesh8:
        igp = IterativeGP(k, s=0.1, mesh=mesh8, axis="tp")
        matvec, _ = igp._matvec_factory(jnp.asarray(x))
        est, _ = slq_logdet(
            matvec, n, probes=64, lanczos_iters=30,
            key=jax.random.PRNGKey(3), dtype=jnp.asarray(x).dtype,
        )
    K = np.asarray(k.gram(x)) + 0.01 * np.eye(n)
    ld_true = float(np.linalg.slogdet(K)[1])
    assert abs(float(est) - ld_true) < 0.15 * max(abs(ld_true), 1.0)


def test_iterative_gp_lazy_matches_dense():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel.iterative import IterativeGP

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.uniform(-1, 1, (300, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]))
    xt = jnp.asarray(rng.uniform(-1, 1, (50, 2)))
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)

    ref = GaussianProcess(kernel=k, s=0.2)
    ref.fit_gp(x, y)
    mu_ref, _ = ref.mean_std(xt)

    it = IterativeGP(k, s=0.2, lazy=True, tol=1e-10, maxiter=600)
    it.fit_gp(x, y)
    mu = it.mean(xt)
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6


def test_lazy_evidence_grads_match_dense_autodiff():
    from stpy_tpu.kernels import functions as F
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_lazy

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.uniform(-1, 1, (200, 2)))
    yv = jnp.asarray(
        np.sin(3 * np.asarray(x)[:, :1]).ravel()
        + 0.1 * rng.standard_normal(200)
    )

    def dense_nll(gamma, kappa, noise):
        K = kappa * jnp.exp(-F.sq_dist(x / gamma, x / gamma) / 2)
        A = K + noise**2 * jnp.eye(200)
        L = jnp.linalg.cholesky(A)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        return (0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 100 * jnp.log(2 * jnp.pi))

    g0, k0, s0 = 0.6, 1.3, 0.4
    val_ref = float(dense_nll(g0, k0, s0))
    gr = jax.grad(dense_nll, argnums=(0, 1, 2))(g0, k0, s0)

    nll, grads = evidence_value_and_grad_lazy(
        x, yv, g0, k0, s0, probes=600, cg_tol=1e-10, cg_maxiter=600,
        lanczos_iters=60,
    )
    # quadratic parts are exact (CG to 1e-10); traces are stochastic —
    # with 600 probes expect ~1-2% relative error on the gradient
    assert abs(float(nll) - val_ref) / abs(val_ref) < 0.02
    for g_est, g_ref, name in zip(
        (grads["gamma"], grads["kappa"], grads["noise"]), gr,
        ("gamma", "kappa", "noise"),
    ):
        denom = max(abs(float(g_ref)), 1.0)
        assert abs(float(g_est) - float(g_ref)) / denom < 0.05, (
            name, float(g_est), float(g_ref))


def test_gram_matmat_and_block_cg_match_dense():
    from stpy_tpu.kernels import functions as F
    from stpy_tpu.ops.pallas_gram_matvec import (
        _gram_matmat_pallas, gram_matmat, make_lazy_matmat,
    )
    from stpy_tpu.parallel.iterative import cg_solve_block

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.uniform(-1, 1, (150, 2)))
    V = jnp.asarray(rng.standard_normal((150, 5)))
    g, s = 0.6, 0.3
    K = jnp.exp(-F.sq_dist(x / g, x / g) / 2)

    out = gram_matmat(x, x, V, family="se", gamma=g)
    assert float(jnp.max(jnp.abs(out - K @ V))) < 1e-10

    # interpret-mode Pallas path (jnp fallback is used on CPU otherwise)
    outp = _gram_matmat_pallas(
        jnp.asarray(x / g, jnp.float32), jnp.asarray(x / g, jnp.float32),
        jnp.asarray(V, jnp.float32), 1.0, family="se", nu=1.0,
        block_m=8, block_n=128, interpret=True,
    )
    assert np.allclose(outp, np.asarray(K @ V), atol=1e-4)

    A = K + s * s * jnp.eye(150)
    mm = make_lazy_matmat(x, family="se", gamma=g, noise=s)
    X, it = cg_solve_block(mm, V, tol=1e-12, maxiter=500)
    ref = jnp.linalg.solve(A, V)
    assert float(jnp.max(jnp.abs(X - ref))) < 1e-8


def test_bbmm_block_probes_still_match_autodiff():
    from stpy_tpu.kernels import functions as F
    from stpy_tpu.parallel.bbmm import evidence_value_and_grad_lazy

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.uniform(-1, 1, (150, 2)))
    yv = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]).ravel()
                     + 0.1 * rng.standard_normal(150))

    def dense_nll(gamma, kappa, noise):
        K = kappa * jnp.exp(-F.sq_dist(x / gamma, x / gamma) / 2)
        A = K + noise**2 * jnp.eye(150)
        L = jnp.linalg.cholesky(A)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        return (0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 75 * jnp.log(2 * jnp.pi))

    gr = jax.grad(dense_nll, argnums=(0, 1, 2))(0.6, 1.3, 0.4)
    _, grads = evidence_value_and_grad_lazy(
        x, yv, 0.6, 1.3, 0.4, probes=500, cg_tol=1e-10, cg_maxiter=500,
        compute_value=False,
    )
    for g_est, g_ref in zip(
        (grads["gamma"], grads["kappa"], grads["noise"]), gr
    ):
        denom = max(abs(float(g_ref)), 1.0)
        assert abs(float(g_est) - float(g_ref)) / denom < 0.06


def test_iterative_gp_lazy_exact_variance():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel.iterative import IterativeGP

    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.uniform(-1, 1, (250, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]))
    xt = jnp.asarray(rng.uniform(-1, 1, (140, 2)))  # > one 128 chunk
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)

    ref = GaussianProcess(kernel=k, s=0.2,
                          var_precision=jax.lax.Precision.HIGHEST)
    ref.fit_gp(x, y)
    mu_ref, std_ref = ref.mean_std(xt)

    it = IterativeGP(k, s=0.2, lazy=True, tol=1e-11, maxiter=800)
    it.fit_gp(x, y)
    mu, std = it.mean_std(xt, method="exact")
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-6
    assert float(jnp.max(jnp.abs(std - std_ref))) < 1e-6


def test_sharded_lazy_matvec_cg_matches_dense():
    from jax.sharding import Mesh
    from stpy_tpu.kernels import functions as F
    from stpy_tpu.ops.pallas_gram_matvec import make_lazy_matvec_sharded
    from stpy_tpu.parallel.iterative import cg_solve

    rng = np.random.default_rng(61)
    n = 320  # divisible by 8 devices
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1])).reshape(-1)
    g, s = 0.5, 0.3
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    mv = make_lazy_matvec_sharded(x, mesh, family="se", gamma=g, noise=s)

    K = jnp.exp(-F.sq_dist(x / g, x / g) / 2) + s * s * jnp.eye(n)
    v = jnp.asarray(rng.standard_normal(n))
    assert float(jnp.max(jnp.abs(mv(v) - K @ v))) < 1e-10

    alpha, it, res = cg_solve(mv, y, tol=1e-10, maxiter=600)
    ref = jnp.linalg.solve(K, y)
    assert float(jnp.max(jnp.abs(alpha - ref))) < 1e-7


def test_fit_evidence_lazy_improves_and_recovers_lengthscale():
    """The matrix-free hyperopt driver (fit_evidence_lazy) must move
    (gamma, noise) toward the dense-evidence optimum from a bad start —
    the n>8k counterpart of Estimator.optimize_params_general."""
    from stpy_tpu.kernels import functions as F
    from stpy_tpu.parallel import fit_evidence_lazy

    rng = np.random.default_rng(7)
    n = 256
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    yv = jnp.asarray(
        np.sin(3 * np.asarray(x)[:, :1]).ravel()
        + 0.1 * rng.standard_normal(n)
    )

    def dense_nll(gamma, noise):
        K = jnp.exp(-F.sq_dist(x / gamma, x / gamma) / 2)
        A = K + noise**2 * jnp.eye(n)
        L = jnp.linalg.cholesky(A)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        return float(0.5 * yv @ a + jnp.sum(jnp.log(jnp.diagonal(L)))
                     + 0.5 * n * jnp.log(2 * jnp.pi))

    g0, s0 = 1.5, 0.4
    out = fit_evidence_lazy(
        x, yv, gamma0=g0, noise0=s0, steps=40, lr=0.15, probes=128,
        cg_tol=1e-8, cg_maxiter=400, probe_tol=1e-4, probe_maxiter=200,
        tol=1e-3, key=jax.random.PRNGKey(2),
    )
    assert out["steps_run"] >= 5
    # the fit must beat the start decisively on the DENSE evidence
    assert dense_nll(out["gamma"], out["noise"]) < dense_nll(g0, s0) - 5.0
    # and land near the dense grid optimum in log-space
    gammas = np.geomspace(0.1, 2.0, 25)
    dense_vals = [dense_nll(g, out["noise"]) for g in gammas]
    g_star = float(gammas[int(np.argmin(dense_vals))])
    assert abs(np.log(out["gamma"]) - np.log(g_star)) < abs(
        np.log(g0) - np.log(g_star)
    )


def test_iterative_gp_optimize_params_lazy():
    """IterativeGP.optimize_params — the matrix-free analogue of
    GaussianProcess.optimize_params — must improve the evidence and write
    winners back into the kernel params / noise."""
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(11)
    n = 256
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(
        np.sin(3 * np.asarray(x)[:, :1])
        + 0.1 * rng.standard_normal((n, 1))
    )
    k = KernelFunction(kernel_name="squared_exponential", gamma=1.5, d=2)
    gp = IterativeGP(k, s=0.4, lazy=True, tol=1e-8, maxiter=400)
    gp.fit_gp(x, y)
    out = gp.optimize_params(
        steps=35, lr=0.15, probes=128, tol=1e-3,
        cg_tol=1e-8, cg_maxiter=400, probe_tol=1e-4, probe_maxiter=200,
        key=jax.random.PRNGKey(5),
    )
    # winners written back
    assert float(k.params_dict["0"]["gamma"]) == pytest.approx(out["gamma"])
    assert gp.s == pytest.approx(out["noise"])
    # moved toward sane values from the bad start
    assert out["gamma"] < 1.5
    assert out["noise"] < 0.4
    # refit posterior is usable
    mu = gp.mean(x[:16])
    assert np.all(np.isfinite(np.asarray(mu)))


def test_iterative_gp_lazy_over_mesh(mesh8):
    """lazy=True with a mesh routes to the SHARDED matrix-free matvec
    (O(n/p + n) per device): single fast atoms, SUMS of fast atoms (one
    fused pass per atom per device), and — for kernel algebra outside the
    fast tier (products, …) — the row-chunked general matvec over the
    same mesh (O(chunk·n)/device). Never the dense O(n²/p) tiles."""
    from stpy_tpu.models import GaussianProcess
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (64, 2))
    y = np.sin(3 * x[:, :1]) + 0.05 * rng.standard_normal((64, 1))
    # fresh kernels per case: KernelFunction.__add__/__mul__ MUTATE self
    # (reference parity, stpy/kernels.py:76-94) — reusing one kse object
    # across cases would alias all three to a single mutated combination
    mk_se = lambda: KernelFunction(
        kernel_name="squared_exponential", gamma=0.5, d=2)
    mk_mat = lambda: KernelFunction(
        kernel_name="matern", gamma=0.8, nu=1.5, d=2)
    cases = [
        ("atom", mk_se(), True),              # fast tier, single fused atom
        ("sum", mk_se() + mk_mat(), True),    # fast tier, 2 fused passes
        ("product", mk_se() * mk_mat(), False),  # general chunked tier
    ]
    xt = rng.uniform(-1, 1, (16, 2))
    from stpy_tpu.parallel.lazy_kernel import fast_atoms

    for name, k, expect_fast in cases:
        # the tier this case claims to exercise is the tier actually taken
        assert (fast_atoms(k) is not None) == expect_fast, name
        gp = GaussianProcess(kernel=k, s=0.1)
        gp.fit_gp(x, y)
        mu_ref = gp.mean_std(xt)[0]
        with mesh8:
            igp = IterativeGP(k, s=0.1, mesh=mesh8, axis="tp", lazy=True,
                              tol=1e-10, chunk=16)
            igp.fit_gp(x, y)
            mu = igp.mean(xt)
        assert float(igp.cg_residual) < 1e-8, name
        assert np.allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-6), name


def test_iterative_gp_double_over_mesh(mesh8):
    """precision='double' now runs ON a mesh (r5, VERDICT task 4): the df
    residual/mean GEMVs shard over the row axis (_make_df_gemv_sharded)
    and the sharded double posterior mean matches the single-device double
    tier to df accuracy. Parity: gauss_procc.py:152 — the reference's f64
    semantics at any n it can hold, now beyond one chip."""
    from stpy_tpu.parallel import IterativeGP

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (64, 2))
    y = np.sin(3 * x[:, :1]) + 0.05 * rng.standard_normal((64, 1))
    mk = lambda: (
        KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=2)
        + KernelFunction(kernel_name="matern", gamma=0.9, nu=1.5, d=2)
    )
    xt = rng.uniform(-1, 1, (24, 2))

    single = IterativeGP(mk(), s=0.1, lazy=True, precision="double",
                         tol=1e-8, df_chunk=32)
    single.fit_gp(x, y)
    mu_single = np.asarray(single.mean(xt))

    with mesh8:
        igp = IterativeGP(mk(), s=0.1, mesh=mesh8, axis="tp", lazy=True,
                          precision="double", tol=1e-8, df_chunk=16)
        igp.fit_gp(x, y)
        mu = np.asarray(igp.mean(xt))
    assert igp.fit_status["precision"] == "double"
    assert igp.df_residuals[-1] < 1e-7     # refinement contracted
    scale = np.max(np.abs(mu_single))
    assert np.max(np.abs(mu - mu_single)) / scale < 1e-7

    # dense-mesh tier (lazy=False) carries the same df refinement
    with mesh8:
        igd = IterativeGP(mk(), s=0.1, mesh=mesh8, axis="tp", lazy=False,
                          precision="double", tol=1e-8, df_chunk=16)
        igd.fit_gp(x, y)
        mud = np.asarray(igd.mean(xt))
    assert np.max(np.abs(mud - mu_single)) / scale < 1e-7


def test_iterative_gp_double_variance_matches_dense_double():
    """The matrix-free df variance (r5, VERDICT task 5): IterativeGP
    (precision='double', var_refine=1).mean_std matches the dense double
    tier's refined variance — block-CG solves refined with df residuals,
    then the row-strip df quadratic form. Parity: gauss_procc.py:391-399
    (f64 predictive variance)."""
    from stpy_tpu.models.exact_gp import GaussianProcess
    from stpy_tpu.parallel.iterative import IterativeGP

    rng = np.random.default_rng(52)
    x = jnp.asarray(rng.uniform(-1, 1, (250, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, :1]))
    xt = jnp.asarray(rng.uniform(-1, 1, (140, 2)))  # > one 128 chunk
    mk = lambda: (
        KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
        + KernelFunction(kernel_name="matern", gamma=0.8, nu=2.5, d=2)
    )

    ref = GaussianProcess(kernel=mk(), s=0.2, precision="double",
                          var_refine=1)
    ref.fit_gp(x, y)
    mu_ref, std_ref = ref.mean_std(xt)

    it = IterativeGP(mk(), s=0.2, lazy=True, precision="double",
                     var_refine=1, tol=1e-9, maxiter=800, df_chunk=64)
    it.fit_gp(x, y)
    mu, std = it.mean_std(xt, method="exact")
    var, var_ref = np.asarray(std).ravel() ** 2, np.asarray(
        std_ref).ravel() ** 2
    assert float(jnp.max(jnp.abs(mu - mu_ref))) < 1e-7
    assert np.max(np.abs(var - var_ref) / np.maximum(var_ref, 1e-12)) < 1e-6
