"""Dedicated df general-ν Matérn Gram (ops/matern_df.py) — the ROADMAP
"dedicated df Bessel" tier: node-scanned quadrature with compensated
(hi, lo) accumulation, replacing the ~40-row generic-interpreter chunks.
Reference parity: stpy/kernels.py:852-858 (scipy.special.kv in f64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scipy.special import gamma as sgamma, kv as skv

from stpy_tpu.ops.matern_df import gram_matern_gen_df


def _ref(x, y, gvec, nu, kappa=1.0):
    dist = np.sqrt(np.maximum(
        (((x[:, None, :] - y[None, :, :]) / gvec) ** 2).sum(-1), 1e-300))
    t = np.sqrt(2 * nu) * np.maximum(dist, 1e-6 / np.sqrt(2 * nu))
    r = (2.0 ** (1 - nu) / sgamma(nu)) * (t ** nu) * skv(nu, t)
    r[np.sqrt(2 * nu) * dist < 1e-6] = 1.0
    return kappa * np.clip(r, 0.0, 1.0)


def _pair64(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


@pytest.mark.parametrize("nu", [0.7, 1.2, 2.7])
def test_df_gram_matches_scipy_f64(nu):
    rng = np.random.default_rng(0)
    n, m, d = 48, 37, 4
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    y = rng.uniform(-1, 1, (m, d)).astype(np.float32).astype(np.float64)
    h, l = gram_matern_gen_df(jnp.asarray(x), jnp.asarray(y), 0.8, nu=nu)
    err = np.abs(_pair64(h, l) - _ref(x, y, np.full(d, 0.8), nu)).max()
    assert err < 5e-9, (nu, err)


def test_df_gram_ard_kappa_and_diag():
    rng = np.random.default_rng(1)
    n, d = 32, 3
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    gv = np.array([0.7, 1.1, 0.9])
    nu, kappa = 2.2, 1.7
    h, l = gram_matern_gen_df(jnp.asarray(x), jnp.asarray(x), gv, kappa,
                              nu=nu)
    got = _pair64(h, l)
    assert np.abs(got - _ref(x, x, gv, nu, kappa)).max() < 5e-9
    # exact r -> 0 limit: diagonal is exactly kappa (in df)
    assert np.abs(np.diag(got) - kappa).max() < 1e-12


def test_df_gram_traced_gamma_lo_restores_f64_meaning():
    """A traced f32 γ with its params_with_lo limb must reproduce the
    f64 γ semantics (the r3 'matern anomaly' contract, exp_r4_anomaly)."""
    rng = np.random.default_rng(2)
    n, m, d = 24, 19, 2
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    y = rng.uniform(-1, 1, (m, d)).astype(np.float32)
    g64, nu = 1.1, 1.2
    gh = np.float32(g64)
    glo = np.float32(np.float64(g64) - np.float64(gh))

    f = jax.jit(lambda gg, gl: gram_matern_gen_df(
        jnp.asarray(x), jnp.asarray(y), gg, nu=nu, gamma_lo=gl))
    h, l = f(jnp.asarray(gh), jnp.asarray(glo))
    err = np.abs(_pair64(h, l) - _ref(
        x.astype(np.float64), y.astype(np.float64),
        np.full(d, g64), nu)).max()
    assert err < 5e-9, err
    # without the lo limb the Gram represents k at f32(γ): visibly worse
    h0, l0 = jax.jit(lambda gg: gram_matern_gen_df(
        jnp.asarray(x), jnp.asarray(y), gg, nu=nu))(jnp.asarray(gh))
    err0 = np.abs(_pair64(h0, l0) - _ref(
        x.astype(np.float64), y.astype(np.float64),
        np.full(d, g64), nu)).max()
    assert err0 > 10 * err, (err0, err)


def test_df_plan_routes_general_nu_to_dedicated_family():
    """General-ν matern (plain and ARD) routes to fam="matern_gen", the
    half-integer fast paths stay on the fused Pallas family."""
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.kernels.df_plan import df_atom_desc

    k = KernelFunction(kernel_name="matern", nu=1.2, gamma=0.8, d=3)
    assert [f for (_, f, *_ ) in df_atom_desc(k)] == ["matern_gen"]
    ka = KernelFunction(kernel_name="ard_matern", nu=0.7,
                        ard_gamma=np.array([0.5, 0.9, 1.1]), d=3)
    assert [f for (_, f, *_ ) in df_atom_desc(ka)] == ["matern_gen"]
    kh = KernelFunction(kernel_name="matern", nu=1.5, gamma=0.8, d=3)
    assert [f for (_, f, *_ ) in df_atom_desc(kh)] == ["matern"]


def test_gp_double_composite_with_general_nu_matches_f64():
    """fit_predict in double mode on se + general-ν matern: the df
    algebra folds a fused atom with the dedicated node-scanned family;
    posterior mean must match the host f64 dense solve (the
    gauss_procc.py:152 every-kernel-f64 contract)."""
    from scipy.linalg import solve_triangular

    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(5)
    n, nt, d, s = 96, 24, 3, 0.1
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    y = np.sin(3 * x[:, :1])
    xt = rng.uniform(-1, 1, (nt, d)).astype(np.float32).astype(np.float64)

    mk = lambda: (KernelFunction(kernel_name="squared_exponential",
                                 gamma=0.7, d=d)
                  + KernelFunction(kernel_name="matern", nu=1.2,
                                   gamma=0.8, d=d))
    gp = GaussianProcess(kernel=mk(), s=s, precision="double")
    mu, sd = gp.fit_predict(jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32),
                            jnp.asarray(xt, jnp.float32))

    def k64(a, b):
        sq = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        se = np.exp(-sq / (2 * 0.49))
        return se + _ref(a, b, np.full(d, 0.8), 1.2)

    K = k64(x, x)
    L = np.linalg.cholesky(K + s * s * np.eye(n))
    al = solve_triangular(L.T, solve_triangular(L, y, lower=True),
                          lower=False)
    mu64 = (k64(xt, x) @ al).ravel()
    err = np.abs(np.asarray(mu, np.float64).ravel() - mu64).max() \
        / np.abs(mu64).max()
    assert err < 1e-6, err


def test_df_gram_row_chunking_matches_single_chunk():
    rng = np.random.default_rng(3)
    n, m, d = 50, 21, 3
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    y = rng.uniform(-1, 1, (m, d)).astype(np.float32).astype(np.float64)
    a = gram_matern_gen_df(jnp.asarray(x), jnp.asarray(y), 0.9, nu=1.4)
    b = gram_matern_gen_df(jnp.asarray(x), jnp.asarray(y), 0.9, nu=1.4,
                           row_chunk=16)
    assert np.abs(_pair64(*a) - _pair64(*b)).max() < 2e-10
