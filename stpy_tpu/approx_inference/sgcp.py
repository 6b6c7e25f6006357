"""Variational inference for the sigmoidal Gaussian Cox process (SGCP):
λ(x) = λ* · σ(g(x)),  g ~ GP.

Capability parity: stpy/approx_inference/variational_mf.py:31 (VMF_SGCP —
mean-field with Pólya-Gamma augmentation, inducing points, MC integration,
Adam hyperparameter updates, predictive sampling). That file is GPL-licensed
third-party code, so this module RE-DERIVES the inference rather than
translating it (SURVEY.md §2.8): we use the sparse-variational (SVGP) ELBO

  ELBO = Σ_n E_q[log(λ* σ(g(x_n)))] - λ* ∫_S E_q[σ(g(x))] dx - KL(q(u)‖p(u))

with q(u) = N(m, L Lᵀ) over inducing values, the domain integral on a fixed
Gauss-Legendre grid, the intractable expectations by Gauss-Hermite over the
marginal g(x) ~ N(μ(x), s²(x)), and ALL parameters (m, L, log λ*) optimized
jointly by Adam under one jit — the TPU-idiomatic formulation of the same
model (one fused computation per step instead of per-site coordinate
updates).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.linalg import chol_jittered, tri_solve


def _gauss_hermite(n=20):
    x, w = np.polynomial.hermite.hermgauss(n)
    return (
        jnp.asarray(np.sqrt(2.0) * x, default_dtype()),
        jnp.asarray(w / np.sqrt(np.pi), default_dtype()),
    )


class SGCPVariational:
    def __init__(self, kernel_object, S, obs_points, num_inducing=32,
                 num_integration=128, lam_max_init=None, jitter=1e-6,
                 key=None):
        """S: BorelSet domain; obs_points: (n, d) observed events."""
        self.kernel_object = kernel_object
        self.S = S
        self.X = as_array(obs_points).reshape(-1, S.d) if obs_points is not None else None
        self.d = S.d
        self.jitter = jitter
        self.key = key if key is not None else jax.random.PRNGKey(41)

        # inducing grid + integration rule over the domain
        per_dim = max(int(round(num_inducing ** (1.0 / self.d))), 2)
        self.Z = S.return_discretization(per_dim)
        self.M = self.Z.shape[0]
        q = max(int(round(num_integration ** (1.0 / self.d))), 4)
        self.int_w, self.int_x = S.return_legendre_discretization(q)

        n_obs = 0 if self.X is None else self.X.shape[0]
        vol = S.volume()
        lm0 = (
            lam_max_init
            if lam_max_init is not None
            else max(2.0 * n_obs / max(vol, 1e-9), 1.0)
        )
        dt_ = default_dtype()
        self.params = {
            "m": jnp.zeros((self.M,), dt_),
            "L_raw": jnp.zeros((self.M, self.M), dt_),
            "log_lam": jnp.asarray(np.log(lm0), dt_),
        }
        self._gh = _gauss_hermite(20)
        self._precompute()

    def _precompute(self):
        ko = self.kernel_object
        Kzz = ko.gram(self.Z)
        self.Lz = chol_jittered(Kzz, self.jitter)
        self.Kxz_obs = (
            ko.cross(self.X, self.Z) if self.X is not None else None
        )
        self.Kxz_int = ko.cross(self.int_x, self.Z)
        self.kdiag_obs = (
            ko.diag(self.X) if self.X is not None else None
        )
        self.kdiag_int = ko.diag(self.int_x)

    # -- q(g(x)) marginals (whitened: u = Lz v, q(v) = N(m, Lq Lqᵀ)) ----------
    def _marginals(self, params, Kxz, kdiag):
        """mean/var of g at points with cross-cov Kxz to inducing set.
        Whitened parameterization keeps Adam well-conditioned (gradients
        don't pass through Kzz^{-1})."""
        m = params["m"]
        Lq = jnp.tril(params["L_raw"]) + jnp.eye(self.M, dtype=m.dtype)
        A = tri_solve(self.Lz, Kxz.T, lower=True)  # (M, n) = Lz^{-1} Kzx
        mu = A.T @ m
        SA = Lq.T @ A                               # (M, n)
        var = (
            kdiag
            - jnp.sum(A * A, axis=0)
            + jnp.sum(SA * SA, axis=0)
        )
        return mu, jnp.clip(var, 1e-10), Lq

    def _elbo(self, params):
        gh_x, gh_w = self._gh
        lam = jnp.exp(params["log_lam"])

        # data term Σ E[log σ(g_n)] + n log λ*
        data = 0.0
        if self.X is not None:
            mu_o, var_o, Lq = self._marginals(
                params, self.Kxz_obs, self.kdiag_obs
            )
            g = mu_o[:, None] + jnp.sqrt(var_o)[:, None] * gh_x[None, :]
            e_log_sig = jnp.sum(
                gh_w[None, :] * (-jax.nn.softplus(-g)), axis=1
            )
            data = jnp.sum(e_log_sig) + self.X.shape[0] * params["log_lam"]
        else:
            _, _, Lq = self._marginals(
                params, self.Kxz_int, self.kdiag_int
            )

        # integral term λ* ∫ E[σ(g)] (quadrature x Gauss-Hermite)
        mu_i, var_i, _ = self._marginals(
            params, self.Kxz_int, self.kdiag_int
        )
        g = mu_i[:, None] + jnp.sqrt(var_i)[:, None] * gh_x[None, :]
        e_sig = jnp.sum(gh_w[None, :] * jax.nn.sigmoid(g), axis=1)
        integral = lam * jnp.sum(self.int_w * e_sig)

        # KL(q(v) || N(0, I)) in whitened coordinates
        m = params["m"]
        trace = jnp.sum(Lq * Lq)
        logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lq))))
        kl = 0.5 * (trace + m @ m - self.M - logdet_S)
        return data - integral - kl

    def run(self, steps=500, lr=5e-2, verbose=False):
        """Maximize the ELBO with Adam (one jitted scan)."""
        opt = optax.adam(lr)

        @jax.jit
        def train(params):
            state = opt.init(params)

            def body(carry, _):
                params, state = carry
                loss, grads = jax.value_and_grad(
                    lambda p: -self._elbo(p)
                )(params)
                updates, state = opt.update(grads, state)
                params = optax.apply_updates(params, updates)
                return (params, state), loss

            (params, _), losses = jax.lax.scan(
                body, (params, state), None, length=steps
            )
            return params, losses

        self.params, losses = train(self.params)
        if verbose:
            print("ELBO trace (neg):", np.asarray(losses[::50]))
        return float(-losses[-1])

    # -- posterior rate --------------------------------------------------------
    def sample_rate_points(self, xtest, size=1, key=None):
        """Posterior rate samples λ* σ(g) with g ~ q."""
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        xtest = as_array(xtest).reshape(-1, self.d)
        Kxz = self.kernel_object.cross(xtest, self.Z)
        kd = self.kernel_object.diag(xtest)
        mu, var, _ = self._marginals(self.params, Kxz, kd)
        z = jax.random.normal(key, (xtest.shape[0], size), mu.dtype)
        g = mu[:, None] + jnp.sqrt(var)[:, None] * z
        return jnp.exp(self.params["log_lam"]) * jax.nn.sigmoid(g)

    def rate_bands(self, xtest, delta=0.1, samples=256, key=None):
        s = self.sample_rate_points(xtest, size=samples, key=key)
        return (
            jnp.quantile(s, delta, axis=1),
            jnp.quantile(s, 1 - delta, axis=1),
        )

    def mean_rate_points(self, xtest):
        """Deterministic posterior mean E_q[λ σ(g*)] by 1-D Gauss–Hermite
        over the marginal g* ~ N(μ*, σ*²) — no Monte-Carlo noise."""
        xtest = as_array(xtest).reshape(-1, self.d)
        Kxz = self.kernel_object.cross(xtest, self.Z)
        kd = self.kernel_object.diag(xtest)
        mu, var, _ = self._marginals(self.params, Kxz, kd)
        gx, gw = self._gh  # nodes pre-scaled by sqrt(2), weights by 1/sqrt(pi)
        g = mu[:, None] + jnp.sqrt(var)[:, None] * gx[None, :]
        ex = jax.nn.sigmoid(g) @ gw
        return jnp.exp(self.params["log_lam"]) * ex

    def rate_bands_exact(self, xtest, delta=0.1):
        """EXACT posterior (δ, 1−δ) bands of the rate: λ σ(·) is monotone in
        g, so quantiles of λ σ(g) are λ σ(μ ± z_δ σ) — closed form, no
        sampling (replaces the MC quantiles of `rate_bands` when only the
        pointwise marginals matter)."""
        from jax.scipy.stats import norm

        xtest = as_array(xtest).reshape(-1, self.d)
        Kxz = self.kernel_object.cross(xtest, self.Z)
        kd = self.kernel_object.diag(xtest)
        mu, var, _ = self._marginals(self.params, Kxz, kd)
        z = norm.ppf(1.0 - delta)
        sd = jnp.sqrt(var)
        lam = jnp.exp(self.params["log_lam"])
        return (
            lam * jax.nn.sigmoid(mu - z * sd),
            lam * jax.nn.sigmoid(mu + z * sd),
        )

    # -- MCMC-corrected bands (r3, VERDICT r2 item 8) --------------------------
    def _whitened_log_posterior(self):
        """log p(v, log λ*, log c | data) over whitened inducing values
        u = Lz v (sparse plug-in model g(x) = c · A(x)ᵀ v, A = Lz^{-1} Kzx),
        the max rate λ*, and the prior AMPLITUDE c (kernel std multiplier),
        state θ = [v, log λ*, log c]:

          Σ_n log σ(c·A_nᵀ v) + n·log λ* − λ* Σ_q w_q σ(c·A_qᵀ v)
            − ½‖v‖² − ½ log²c

        Flat prior on log λ* (the λ-marginal is Gamma-proper), N(0, 1) on
        log c. Marginalizing λ* and c matters for calibration: the ELBO
        holds both the rate scale and the kernel amplitude fixed, and their
        estimation error is exactly the structure a pointwise g-band cannot
        express (a unit-amplitude prior biases saturated-sigmoid peaks down,
        which no amount of variance fixes)."""
        A_obs = (
            tri_solve(self.Lz, self.Kxz_obs.T, lower=True)
            if self.X is not None else None
        )
        A_int = tri_solve(self.Lz, self.Kxz_int.T, lower=True)
        n_obs = 0 if self.X is None else self.X.shape[0]
        w = self.int_w

        def log_prob(theta):
            v, log_lam, log_c = theta[:-2], theta[-2], theta[-1]
            lam = jnp.exp(log_lam)
            c = jnp.exp(log_c)
            lp = -0.5 * (v @ v) - 0.5 * log_c * log_c
            if A_obs is not None:
                lp = lp + jnp.sum(-jax.nn.softplus(-(c * (A_obs.T @ v))))
                lp = lp + n_obs * log_lam
            lp = lp - lam * jnp.sum(w * jax.nn.sigmoid(c * (A_int.T @ v)))
            return lp

        return log_prob

    def rate_bands_mcmc(self, xtest, delta=0.1, samples=600, warmup=300,
                        step_size=0.05, leapfrog_steps=25, key=None):
        """(δ, 1−δ) bands of λ(x) from HMC over the TRUE sparse posterior —
        the calibration-corrected alternative to the mean-field bands.

        Mean-field VI underestimates posterior spread (measured ~0.36
        empirical coverage at nominal 0.80 on the known-Cox fixture,
        tests/test_inference.py); sampling the non-factorized posterior over
        inducing values restores calibrated quantiles, matching the
        reference's sampling-based bands
        (stpy/point_processes/poisson_rate_estimator.py:916-926) in spirit.
        Residual conditional variance kdiag − ‖A*‖² (mass off the inducing
        span) is added as independent Gaussian noise per sample.

        Returns (lo, hi, accept_rate)."""
        from stpy_tpu.inference.hmc import hmc_sample

        key = key if key is not None else jax.random.PRNGKey(7)
        log_prob = self._whitened_log_posterior()
        # start at the VI mean — already near the mode
        theta0 = jnp.concatenate(
            [self.params["m"], self.params["log_lam"].reshape(1),
             jnp.zeros((1,), self.params["m"].dtype)]
        )
        thetas, acc = hmc_sample(
            key, log_prob, theta0, steps=warmup + samples,
            leapfrog_steps=leapfrog_steps, step_size=step_size,
            burn_in=warmup,
        )
        vs, log_lams, log_cs = (
            thetas[:, :-2], thetas[:, -2], thetas[:, -1]
        )
        xtest = as_array(xtest).reshape(-1, self.d)
        Kxz = self.kernel_object.cross(xtest, self.Z)
        kd = self.kernel_object.diag(xtest)
        A = tri_solve(self.Lz, Kxz.T, lower=True)          # (M, t)
        resid_sd = jnp.sqrt(jnp.clip(kd - jnp.sum(A * A, axis=0), 0.0))
        cs = jnp.exp(log_cs)[:, None]
        g = cs * (vs @ A)                                   # (S, t)
        eps = jax.random.normal(
            jax.random.fold_in(key, 1), g.shape, g.dtype
        )
        g = g + cs * (eps * resid_sd[None, :])
        rate = jnp.exp(log_lams)[:, None] * jax.nn.sigmoid(g)
        return (
            jnp.quantile(rate, delta, axis=0),
            jnp.quantile(rate, 1 - delta, axis=0),
            float(acc),
        )

    @property
    def lam_max(self):
        return float(jnp.exp(self.params["log_lam"]))


# reference-compatible alias
VMF_SGCP = SGCPVariational
