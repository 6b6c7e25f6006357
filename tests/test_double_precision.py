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


def test_double_mode_general_nu_matern_fits():
    """General-ν Matérn is df-expressible since r5 (scatter-free Bessel
    quadrature, kernels/functions.py:bessel_kv) — the full double-mode GP
    posterior must run and match the f64 dense solve of the same Gram
    (r4's rejection of this family is the capability this replaced)."""
    import jax.numpy as jnp

    from stpy_tpu.kernels import KernelFunction

    k = KernelFunction(kernel_name="matern", nu=1.2, gamma=0.5, d=1)
    x, y, xt = _setup(n=48, nt=16, d=1)
    gp = GaussianProcess(kernel=k, s=0.1, precision="double")
    gp.fit_gp(x, y)
    mu, _ = gp.mean_std(xt)
    K = np.asarray(k.cross(jnp.asarray(x), jnp.asarray(x)), np.float64)
    Ks = np.asarray(k.cross(jnp.asarray(xt), jnp.asarray(x)), np.float64)
    mu_ref = Ks @ np.linalg.solve(K + 0.01 * np.eye(len(x)), y)
    err = np.abs(np.asarray(mu) - mu_ref).max() / np.abs(mu_ref).max()
    assert err < 1e-5


def test_double_mode_rejects_inexpressible_atoms():
    """Primitives the generic df interpreter has no rule for (here: erf
    inside a gibbs lengthscale function) must raise, naming them — an
    honest capability boundary, not a silent f32 fallback."""
    import jax.scipy.special as jsp

    from stpy_tpu.kernels import KernelFunction

    k = KernelFunction(
        kernel_name="gibbs",
        gamma_fun=lambda x: 1.0 + 0.1 * jsp.erf((x * x).sum(axis=1)),
        d=1,
    )
    gp = GaussianProcess(kernel=k, precision="double")
    x, y, _ = _setup(n=32, nt=8, d=1)
    with pytest.raises(NotImplementedError, match="no df rule"):
        gp.fit_gp(x[:, :1], y)


# -- r3: Matérn + composite df coverage (VERDICT r2 item 4) -------------------

def _matern_np(sq, gamma, nu, kappa=1.0):
    t = np.sqrt(2.0 * nu * sq) / gamma
    if nu == 1.5:
        P = 1.0 + t
    elif nu == 2.5:
        P = 1.0 + t + t * t / 3.0
    else:
        P = 1.0
    return kappa * P * np.exp(-t)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_df_matern_kernel_interpret_accuracy(nu):
    """The actual df kernel arithmetic (interpret mode, f32 EFTs) must hit
    ~1e-9 relative against the f64 closed form — Matérn families (r3)."""
    from stpy_tpu.ops.pallas_gram_df import gram_df

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (40, 3))
    y = rng.uniform(-1, 1, (30, 3))
    gamma, kappa = 0.6, 1.3
    hi, lo = gram_df(np.float32(x), np.float32(y), gamma, kappa,
                     family="matern", nu=nu, interpret=True)
    sq = ((np.float64(np.float32(x))[:, None, :]
           - np.float64(np.float32(y))[None, :, :]) ** 2).sum(-1)
    ref = _matern_np(sq, gamma, nu, kappa)
    got = np.float64(np.asarray(hi)) + np.float64(np.asarray(lo))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-8


def test_df_se_hlo_fallback_large_d():
    """d > DF_MAX_D routes to the row-chunked HLO df path — same contract."""
    from stpy_tpu.ops.pallas_gram_df import DF_MAX_D, gram_df

    d = DF_MAX_D + 12
    rng = np.random.default_rng(3)
    x = np.float32(rng.uniform(-1, 1, (37, d)))
    y = np.float32(rng.uniform(-1, 1, (23, d)))
    hi, lo = gram_df(x, y, 2.5, 1.0, family="se", interpret=True)
    sq = ((np.float64(x)[:, None, :] - np.float64(y)[None, :, :]) ** 2
          ).sum(-1) / (2.5 * 2.5)
    ref = np.exp(-0.5 * sq)
    got = np.float64(np.asarray(hi)) + np.float64(np.asarray(lo))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-8


def _f64_reference_kernel(Kfun, x, y, xt, s):
    K = Kfun(x, x)
    Ks = Kfun(xt, x)
    A = K + s * s * np.eye(len(x))
    mu = Ks @ np.linalg.solve(A, y)
    W = np.linalg.solve(A, Ks.T)
    var = Kfun(xt[:1], xt[:1])[0, 0] - np.einsum("tn,nt->t", Ks, W)
    return mu, np.sqrt(np.maximum(var, 1e-30))


def _sq(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_double_mode_matern_matches_f64():
    from stpy_tpu.kernels import KernelFunction

    x, y, xt = _setup()
    s, gamma, nu = 0.1, 0.8, 1.5
    k = KernelFunction(kernel_name="matern", gamma=gamma, nu=nu, d=2)
    gp = GaussianProcess(kernel=k, s=s, precision="double")
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)
    mu_ref, std_ref = _f64_reference_kernel(
        lambda a, b: _matern_np(_sq(a, b), gamma, nu), x, y, xt, s
    )
    assert (np.abs(np.asarray(mu) - mu_ref).max()
            / np.abs(mu_ref).max()) < 1e-6
    assert (np.abs(np.asarray(std).ravel() - std_ref).max()
            / std_ref.max()) < 1e-5


@pytest.mark.parametrize("op", ["+", "*"])
def test_double_mode_composite_se_matern_matches_f64(op):
    """se ± matern algebra through the df path (VERDICT r2 item 4 done-bar)."""
    from stpy_tpu.kernels import KernelFunction

    x, y, xt = _setup()
    s, g1, g2, nu = 0.1, 0.7, 1.1, 2.5
    k1 = KernelFunction(kernel_name="squared_exponential", gamma=g1, d=2)
    k2 = KernelFunction(kernel_name="matern", gamma=g2, nu=nu, d=2)
    k = (k1 + k2) if op == "+" else (k1 * k2)
    gp = GaussianProcess(kernel=k, s=s, precision="double")
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)

    def Kfun(a, b):
        Kse = np.exp(-_sq(a, b) / (2 * g1 * g1))
        Km = _matern_np(_sq(a, b), g2, nu)
        return Kse + Km if op == "+" else Kse * Km

    mu_ref, std_ref = _f64_reference_kernel(Kfun, x, y, xt, s)
    assert (np.abs(np.asarray(mu) - mu_ref).max()
            / np.abs(mu_ref).max()) < 1e-6
    assert (np.abs(np.asarray(std).ravel() - std_ref).max()
            / std_ref.max()) < 1e-5


def test_double_mode_ard_matern_matches_f64():
    from stpy_tpu.kernels import KernelFunction

    x, y, xt = _setup()
    s, nu = 0.1, 1.5
    gv = np.array([0.5, 1.4])
    k = KernelFunction(kernel_name="ard_matern", ard_gamma=gv, nu=nu, d=2)
    gp = GaussianProcess(kernel=k, s=s, precision="double")
    gp.fit_gp(x, y)
    mu, std = gp.mean_std(xt)

    def Kfun(a, b):
        sq = (((a[:, None, :] - b[None, :, :]) / gv) ** 2).sum(-1)
        return _matern_np(sq, 1.0, nu)

    mu_ref, std_ref = _f64_reference_kernel(Kfun, x, y, xt, s)
    assert (np.abs(np.asarray(mu) - mu_ref).max()
            / np.abs(mu_ref).max()) < 1e-6
    assert (np.abs(np.asarray(std).ravel() - std_ref).max()
            / std_ref.max()) < 1e-5


def test_df_gram_entry_accuracy_hlo_f32():
    """df Gram ENTRIES (HLO EFT path, pure f32 arithmetic — the same
    formulas the Mosaic kernel lowers) match f64 to ~1e-10 absolute for
    every df family. Guards the _df_exp series depth and the df cubic
    term: with the cubic tail in plain f32 the floor was 0.5-1.3e-9,
    which capped composite-kernel posterior means at 1.3e-6 (r3 batch D)."""
    import jax.numpy as jnp

    from stpy_tpu.ops import pallas_gram_df as M

    rng = np.random.default_rng(3)
    n, d = 256, 6
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)
    y = rng.uniform(-1, 1, (n, d)).astype(np.float32).astype(np.float64)

    def ref(fam, nu, g):
        a, b = x / g, y / g
        sq = np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
            - 2.0 * (a @ b.T), 0.0)
        if fam == "se":
            return np.exp(-sq / 2)
        t = np.sqrt(2 * nu * sq)
        P = {0.5: 1.0, 1.5: 1.0 + t, 2.5: 1.0 + t + t * t / 3.0}[nu]
        return P * np.exp(-t)

    for fam, nu, g in [("se", 1.5, 0.5), ("matern", 1.5, 0.8),
                       ("matern", 2.5, 1.1), ("matern", 0.5, 0.7)]:
        inv64 = 1.0 / np.float64(g)
        ih = np.float32(inv64)
        il = np.float32(inv64 - np.float64(ih))
        xh, xl = M._df_scale_coords(
            jnp.asarray(x, jnp.float32),
            jnp.asarray([ih] * d, jnp.float32),
            jnp.asarray([il] * d, jnp.float32))
        yh, yl = M._df_scale_coords(
            jnp.asarray(y, jnp.float32),
            jnp.asarray([ih] * d, jnp.float32),
            jnp.asarray([il] * d, jnp.float32))
        kap = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
        Kh, Kl = M._gram_df_hlo(xh, xl, yh, yl, kap, family=fam, nu=nu)
        assert Kh.dtype == jnp.float32
        got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
        err = np.max(np.abs(got - ref(fam, nu, g)))
        assert err < 5e-10, (fam, nu, err)


def test_gamma_lo_restores_f64_meaning():
    """The r3 'matern anomaly' regression (benchmarks/exp_r4_anomaly.py):
    an f32-inexact γ (1.1) evaluated at f32-rounded semantics shifts df
    Gram entries by δγ·t²(1+t)e^{-t}/3 — worst ~1.3e-8 at t = 1+√3. The
    gamma_lo limb (df reciprocal of the (hi, lo) pair) must restore the
    f64 meaning to the kernel's own ~1e-10 floor. Runs the REAL Pallas
    kernel in interpret mode (f32 semantics) on CPU."""
    import numpy as np
    import jax.numpy as jnp

    from stpy_tpu.ops.pallas_gram_df import gram_df

    G, NU = 1.1, 2.5
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (192, 4)).astype(np.float32).astype(np.float64)
    y = rng.uniform(-1, 1, (160, 4)).astype(np.float32).astype(np.float64)
    sq = (((x[:, None, :] - y[None, :, :]) / G) ** 2).sum(-1)
    t = np.sqrt(2 * NU * sq)
    ref = (1 + t + t * t / 3) * np.exp(-t)

    gh = jnp.asarray(np.float32(G))
    gl = jnp.asarray(np.float32(np.float64(G) - np.float64(np.float32(G))))
    args = (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), gh)
    Kh, Kl = gram_df(*args, family="matern", nu=NU, interpret=True)
    err_no_lo = np.max(np.abs(
        np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64) - ref))
    Kh, Kl = gram_df(*args, family="matern", nu=NU, interpret=True,
                     gamma_lo=gl)
    err_lo = np.max(np.abs(
        np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64) - ref))
    # without the limb: the predicted f32-γ semantic shift; with it: floor
    assert err_no_lo > 3e-9, err_no_lo
    assert err_lo < 1e-9, err_lo


def test_params_with_lo_value_keyed():
    """Lo shadows restore γ − f32(γ) only while the stored value IS the
    rounding of the construction-time value; hyperopt overwrites
    invalidate them (the fitted value then means exactly its f32 self)."""
    import numpy as np
    import jax.numpy as jnp

    from stpy_tpu.kernels import KernelFunction

    G = 1.1
    k = KernelFunction(kernel_name="matern", gamma=G, nu=2.5, d=4)
    # simulate TPU f32 storage (tests run x64, where no shadow is needed)
    k.params_dict["0"]["gamma"] = jnp.asarray(np.float32(G), jnp.float32)
    k._params_lo = {}
    k._record_lo("0", "gamma", G)
    lo = k.lo_limbs("0")["gamma"]
    assert lo is not None
    assert np.allclose(np.asarray(lo, np.float64),
                       np.float64(G) - np.float64(np.float32(G)))
    aug = k.params_with_lo()
    assert "gamma__lo" in aug["0"] and "kappa__lo" in aug["0"]
    assert float(np.asarray(aug["0"]["gamma__lo"]).reshape(-1)[0]) != 0.0
    # overwrite (hyperopt write-back) -> shadow invalid -> zero limb
    k.params_dict["0"]["gamma"] = jnp.asarray(np.float32(0.9), jnp.float32)
    assert k.lo_limbs("0")["gamma"] is None
    assert float(np.asarray(
        k.params_with_lo()["0"]["gamma__lo"]).reshape(-1)[0]) == 0.0
