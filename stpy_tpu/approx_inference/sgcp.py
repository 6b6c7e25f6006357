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

    # -- deterministic corrected bands (r5, VERDICT task 7) --------------------
    def _elbo_extended(self, theta, Lq_fixed):
        """ELBO as a function of the MEAN parameters θ = [m, log λ*, log c]
        with the variational covariance Lq FROZEN at the VI optimum and a
        kernel-amplitude multiplier c on the g marginals — the objective
        whose curvature defines the linear-response covariance.

        Crucially this is the ELBO, not the raw log posterior: the
        Gauss-Hermite expectations integrate over q's g-spread, so the
        curvature stays honest where the sigmoid saturates (a raw-MAP
        Laplace collapses there: the likelihood is flat in g, the prior
        drags the mode down, and the v–c degeneracy leaves the Hessian
        indefinite — measured, r5)."""
        gh_x, gh_w = self._gh
        M = self.M
        m, log_lam, log_c = theta[:M], theta[M], theta[M + 1]
        lam = jnp.exp(log_lam)
        c = jnp.exp(log_c)

        def marginals(Kxz, kdiag):
            A = tri_solve(self.Lz, Kxz.T, lower=True)
            mu = c * (A.T @ m)
            SA = Lq_fixed.T @ A
            var = (c * c) * jnp.clip(
                kdiag - jnp.sum(A * A, axis=0) + jnp.sum(SA * SA, axis=0),
                1e-10)
            return mu, var

        data = 0.0
        if self.X is not None:
            mu_o, var_o = marginals(self.Kxz_obs, self.kdiag_obs)
            g = mu_o[:, None] + jnp.sqrt(var_o)[:, None] * gh_x[None, :]
            data = jnp.sum(gh_w[None, :] * (-jax.nn.softplus(-g))) \
                + self.X.shape[0] * log_lam
        mu_i, var_i = marginals(self.Kxz_int, self.kdiag_int)
        g = mu_i[:, None] + jnp.sqrt(var_i)[:, None] * gh_x[None, :]
        e_sig = jnp.sum(gh_w[None, :] * jax.nn.sigmoid(g), axis=1)
        integral = lam * jnp.sum(self.int_w * e_sig)
        # m-dependent KL part + N(0,1) prior on log c (the trace/logdet
        # KL terms are constants in θ here)
        kl = 0.5 * (m @ m) + 0.5 * log_c * log_c
        return data - integral - kl

    def rate_bands_linear_response(self, xtest, delta=0.1, newton_steps=20):
        """(δ, 1−δ) bands from the LINEAR-RESPONSE covariance at the VI
        optimum — deterministic, no MCMC, one (M+2)×(M+2) Hessian.

        Why the factorized band under-covers (~0.55 at nominal 0.80,
        benchmarks/exp_r4_sgcp_cal.py): mean-field q drops (a) posterior
        correlations between inducing values and (b) ALL uncertainty in
        λ* and the kernel amplitude c — the ELBO treats both as point
        estimates. Linear response (Giordano–Broderick–Jordan style)
        recovers exactly those terms: perturbing log p by tᵀθ moves the
        VI optimum by Σ_LR·t with Σ_LR = (−∇²_θ ELBO)⁻¹ over the MEAN
        parameters θ = [m, log λ*, log c] (variational covariance frozen
        — `_elbo_extended`), so Σ_LR is the response covariance of the
        fit. Total predictive spread = q's own marginal variance PLUS the
        delta-method propagation of Σ_LR (g = c·aᵀm is bilinear, Jacobian
        exact), plus the off-inducing-span conditional variance; quantiles
        of λ*σ(g) come off a weighted 2-D Gauss-Hermite lattice over the
        joint (g, log λ*) Gaussian — closed-form cheap and PRNG-free. The
        HMC band (`rate_bands_mcmc`) remains the nominal standard; this is
        the calibrated CHEAP tier (parity: poisson_rate_estimator.py:
        916-926, sampled quantile bands)."""
        M = self.M
        Lq_fixed = jnp.tril(self.params["L_raw"]) + jnp.eye(
            M, dtype=self.params["m"].dtype)
        nF = lambda t: -self._elbo_extended(t, Lq_fixed)
        theta = jnp.concatenate(
            [self.params["m"], self.params["log_lam"].reshape(1),
             jnp.zeros((1,), self.params["m"].dtype)]
        )

        # damped Newton to the joint optimum (the VI fit is its stationary
        # point in m and log λ*; log c re-optimizes in a couple of steps)
        @jax.jit
        def newton_step(th):
            g = jax.grad(nF)(th)
            H = jax.jacfwd(jax.grad(nF))(th)
            H = 0.5 * (H + H.T) + 1e-6 * jnp.eye(
                th.shape[0], dtype=th.dtype)
            lam_e, V_e = jnp.linalg.eigh(H)
            lam_e = jnp.maximum(lam_e, 1e-5)      # PSD-guarded step
            step = V_e @ ((V_e.T @ g) / lam_e)
            cands = jnp.stack([th - s * step for s in (1.0, 0.5, 0.25)])
            vals = jax.vmap(nF)(cands)
            best = jnp.argmin(vals)
            better = vals[best] < nF(th)
            return jnp.where(better, cands[best], th)

        for _ in range(max(1, newton_steps)):
            theta = newton_step(theta)
        H = jax.jacfwd(jax.grad(nF))(theta)
        H = 0.5 * (H + H.T)
        # PSD-guarded inverse: clip the response spectrum at a small
        # positive floor (a soft direction means a near-flat ELBO — the
        # response there is capped, not infinite/negative)
        lam_e, V_e = jnp.linalg.eigh(H)
        lam_e = jnp.maximum(lam_e, 1e-5)
        Sigma = (V_e / lam_e[None, :]) @ V_e.T

        m_opt, log_c = theta[:M], theta[M + 1]
        c = jnp.exp(log_c)

        xtest = as_array(xtest).reshape(-1, self.d)
        Kxz = self.kernel_object.cross(xtest, self.Z)
        kd = self.kernel_object.diag(xtest)
        A = tri_solve(self.Lz, Kxz.T, lower=True)           # (M, t)
        SA = Lq_fixed.T @ A
        # q's own marginal variance of g (the MFVI band's spread) ...
        var_q = (c * c) * jnp.clip(
            kd - jnp.sum(A * A, axis=0) + jnp.sum(SA * SA, axis=0), 0.0)

        g_mean = c * (A.T @ m_opt)                          # (t,)
        # ... plus the linear-response covariance of the FIT, propagated
        # through the exact Jacobian of g = c·aᵀm: [c·a (m rows), 0 (ℓ),
        # g (log c)]; ℓ = log λ* is coordinate M
        Jg_v = c * A                                        # (M, t)
        SvJ = Sigma[:M, :M] @ Jg_v                          # (M, t)
        var_g = (
            var_q
            + jnp.sum(Jg_v * SvJ, axis=0)
            + 2.0 * g_mean * (Sigma[:M, M + 1] @ Jg_v)
            + g_mean**2 * Sigma[M + 1, M + 1]
        )
        cov_gl = Sigma[:M, M] @ Jg_v + g_mean * Sigma[M + 1, M]
        var_l = Sigma[M, M]
        l_mean = theta[M]

        # quantiles of exp(ℓ)·σ(g) over the per-point 2-D Gaussian by a
        # weighted tensor Gauss-Hermite lattice (16×16): sort node values,
        # accumulate weights, pick the δ / 1−δ crossings — deterministic
        gx, gw = _gauss_hermite(16)
        z1 = jnp.repeat(gx, gx.shape[0])
        z2 = jnp.tile(gx, gx.shape[0])
        wts = (gw[:, None] * gw[None, :]).ravel()
        sd_g = jnp.sqrt(jnp.clip(var_g, 1e-12))
        rho = jnp.clip(
            cov_gl / jnp.maximum(sd_g * jnp.sqrt(jnp.maximum(
                var_l, 1e-12)), 1e-12), -0.999, 0.999)
        g_nodes = g_mean[:, None] + sd_g[:, None] * z1[None, :]
        l_nodes = l_mean + jnp.sqrt(jnp.maximum(var_l, 1e-12)) * (
            rho[:, None] * z1[None, :]
            + jnp.sqrt(jnp.clip(1 - rho**2, 1e-12, None))[:, None]
            * z2[None, :]
        )
        rate = jnp.exp(l_nodes) * jax.nn.sigmoid(g_nodes)   # (t, 256)

        order = jnp.argsort(rate, axis=1)
        sorted_rate = jnp.take_along_axis(rate, order, axis=1)
        sorted_w = jnp.cumsum(wts[order], axis=1)

        def pick(q):
            idx = jnp.argmax(sorted_w >= q, axis=1)
            return jnp.take_along_axis(
                sorted_rate, idx[:, None], axis=1)[:, 0]

        return pick(delta), pick(1.0 - delta)

    @property
    def lam_max(self):
        return float(jnp.exp(self.params["log_lam"]))


# reference-compatible alias
VMF_SGCP = SGCPVariational
