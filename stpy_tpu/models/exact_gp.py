"""Exact Gaussian-process regression — the core model.

Parity: stpy/continuous_processes/gauss_procc.py:18 (GaussianProcess) with
fit_gp (:136), mean_std (:310), sample (:461), log_marginal (:497-638,
squared + MAP/Laplace robust losses via Danskin), optimize_params (:640),
ucb_optimize (:918), sample_and_max (:985).

TPU-first design:
  * fit = fused Pallas Gram + one Cholesky; mean/var/sample all reuse the
    factor (the reference re-solves via lstsq per call, gauss_procc.py:367).
  * predictive diag is vectorized (`kernel.diag`) — the reference loops
    Python per test point (gauss_procc.py:347).
  * no 10k chunking (gauss_procc.py:310-334): XLA streams HBM tiles; a 16k
    x 16k predict fits comfortably on one chip.
  * robust losses (huber/svr/unif) solve on-device with L-BFGS instead of
    cvxpy+MOSEK; their evidence uses the same Danskin/Laplace construction.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype, default_jitter
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import (
    cho_solve,
    cho_solve_blocked,
    chol_jittered,
    logdet_from_chol,
    safe_cholesky,
    safe_cholesky_rebuild,
    tri_solve,
    tri_solve_blocked,
)
from stpy_tpu.models.estimator import Estimator
from stpy_tpu.opt.lbfgs import minimize_lbfgs
from stpy_tpu.viz import RandomProcess


class GaussianProcess(Estimator, RandomProcess):
    def __init__(
        self, gamma=1.0, s=0.001, kappa=1.0,
        kernel_name="squared_exponential", diameter=1.0, groups=None,
        bounds=None, nu=1.5, kernel=None, d=1, power=2, lam=1.0,
        loss="squared", huber_delta=1.35, hyper="classical", B=1.0,
        svr_eps=0.1, var_precision=None, precision="single", var_refine=0,
        jitter_ladder=True, df_refine_steps=None, qform_precision=None,
        fold_noise=False,
    ):
        # precision of the predictive-variance triangular-solve GEMMs:
        # None -> tri_solve_blocked's HIGH default (bf16x3; measured at
        # n=16k: <=0.8% max relative variance error vs f64, ~35% faster);
        # pass jax.lax.Precision.HIGHEST for <=0.05% (docs/DESIGN.md §5).
        self._var_precision = var_precision
        # precision="double": double-float (hi, lo) Gram (ops/
        # pallas_gram_df.py) + iterative refinement of alpha + df predictive
        # mean — matches the f64 torch reference (gauss_procc.py:367-399)
        # to ≤1e-7 posterior-mean rtol at n=16k on f32-only TPU hardware
        # (measured 8.4e-8 se / 7.2e-8 matern32 / 7.7e-8 se+matern52, r3
        # batch Q2; the pure-f32 path floors at ~5.6e-6). Covers
        # SE/ARD/Matérn(½,3/2,5/2)/laplace atoms and their +/* algebra
        # (r3); variance trisolve runs HIGHEST in this mode.
        if precision not in ("single", "double"):
            raise ValueError(f"precision must be single|double, got {precision}")
        self._precision = precision
        # var_refine >= 1 (double mode only): replace the variance trisolve
        # with one HIGH cho_solve W0 ≈ A⁻¹K*ᵀ plus the fused df quadratic
        # form q̃ = 2bᵀw0 − w0ᵀAw0 (ops/pallas_qform_df.py) — variance
        # error is SECOND order in W0's residual, so a single pass breaks
        # the ~1e-4 relative-variance floor of the trisolve path (the f32
        # GEMM-accumulator limit) with no df W iteration; the train df
        # Gram is cached from the fit. Values > 1 behave like 1 (r3).
        if var_refine and precision != "double":
            raise ValueError("var_refine requires precision='double'")
        self._var_refine = int(var_refine)
        # double-mode iterative-refinement step count. Each step is one
        # exact df residual GEMV + one Cholesky substitution (~0.08 s at
        # n=16k). Default None resolves PER PLAN at jit build: 1 when
        # every atom is a fused df family (batches M and Y measured
        # ir=1 == ir=2 == ir=3 to every printed digit on all three 16k
        # families — one exact-residual step lands on the df
        # representation floor), 3 when ANY atom routes through the
        # generic interpreter tier — high-condition generic kernels need
        # the extra steps (polynomial deg-3, cond ≈ 1e7: posterior mean
        # rel err 8.4e-5 at ir=1 vs 8.7e-8 at ir=3, n=8k on-chip, r5
        # generic done-bar run). Pass an int to pin it.
        self._df_refine_steps = (None if df_refine_steps is None
                                 else max(0, int(df_refine_steps)))
        # var_refine qform main-product precision: None -> "ozaki" (r4 —
        # EXACT integer-slice main product, ops/pallas_qform_df.py; var
        # max 6.2e-7 (se) / 9.3e-7 (matern32) at n=16k, the first config
        # to meet the 1e-6 BASELINE bar; fused fit+predict ~0.93 s).
        # Alternatives: jax.lax.Precision.HIGHEST (bf16x6 — ~3e-6 floor
        # from f32 rounding at the gross pass's partial magnitudes, 0.73
        # s), "split8" (all 2⁻²⁴ cross terms, same ~3e-6 floor — the r4
        # measurement that localized the floor), "bf16x3" (HIGH-grade,
        # 4e-5–2.3e-4 — MAP-grade posteriors only, r3 batch Y).
        self._qform_precision = qform_precision
        # jitter_ladder=False swaps safe_cholesky's escalating retry loop
        # for a single fixed-jitter factorization (chol_jittered). The
        # ladder's while_loop keeps the pre-jitter Gram live across
        # retries, which pushes an n=32k fit past the 16 GB HBM of one v5e
        # (benchmarks/exp_32k.py: fixed-jitter peak ≈ 12 GB → 613 ms fit,
        # 920 ms fit + 16k predict). Trade-off: no automatic escalation on
        # near-singular Grams — fit_status reports ok=False instead.
        # jitter_ladder="recompute" keeps the escalation but REBUILDS the
        # jittered Gram inside each retry (safe_cholesky_rebuild), so peak
        # residency matches the fixed-jitter path (~2n²) while retaining
        # automatic escalation — robust 32k single-chip fits. Retries cost
        # one extra Gram build each (~3 ms Pallas at n=16k; retries are
        # the rare case).
        if jitter_ladder not in (True, False, "recompute"):
            raise ValueError(
                "jitter_ladder must be True, False, or 'recompute', "
                f"got {jitter_ladder!r}"
            )
        self._jitter_ladder = jitter_ladder
        # fold_noise=True (r5, double mode + fixed jitter only): fold
        # s² + jitter into the df Gram DIAGONAL with exact TwoSum ops and
        # factorize that pair directly, instead of materializing a separate
        # A = Kh + s²I buffer. The jitter is exactly UNfolded after the
        # factorization, so iterative refinement and the var_refine qform
        # target K + s²I — bit-for-bit the same system as fold_noise=False
        # (only the ~1e-7-class jitter scale differs in its last rounding).
        # Effect: dense-double fit peak drops from 4n² to 3n² f32 buffers
        # (Kh, Kl, A, L → A-in-Kh, Kl, L): ~17 GB → ~12.9 GB at n=32,768,
        # lifting the one-chip dense-double ceiling from n≈24.5k to ≈32k+
        # (ROADMAP "Accuracy" item 1). Off by default: at n ≤ 24k the
        # standard layout is equally fast and keeps the unjittered Gram
        # around for downstream consumers.
        if fold_noise and precision != "double":
            raise ValueError("fold_noise requires precision='double'")
        if fold_noise and jitter_ladder is not False:
            raise ValueError(
                "fold_noise requires jitter_ladder=False (the escalating "
                "ladder needs the pre-jitter Gram live across retries, "
                "which is exactly the buffer fold_noise removes)"
            )
        self._fold_noise = bool(fold_noise)
        self.s = s
        self.d = d
        self.x = None
        self.y = None
        self.mu = 0.0
        self.lam = lam
        self.total_bound = B
        self.prob = 0.5
        self.svr_eps = svr_eps
        self.fitted = False
        self.diameter = diameter
        self.bounds = bounds
        self.admits_first_order = False
        self.loss = loss
        self.huber_delta = huber_delta
        self.hyper = hyper
        self.beta_mult = 2.0  # ucb/lcb multiplier (reference hard-codes 2)

        if kernel is not None:
            self.kernel_object = kernel
            self.d = kernel.d
        else:
            self.kernel_object = KernelFunction(
                kernel_name=kernel_name, gamma=gamma, nu=nu, groups=groups,
                kappa=kappa, power=power, d=d,
            )
        self.kernel = self.kernel_object.kernel  # reference-convention callable
        self._fit_fn = None
        self._predict_fn = None

    # -- descriptions ----------------------------------------------------------
    def description(self):
        return self.kernel_object.description() + "\nlambda=" + str(self.s)

    def embed(self, x):
        return self.kernel_object.embed(x)

    def get_basis_size(self):
        return self.kernel_object.get_basis_size()

    # -- fitting ---------------------------------------------------------------
    def _df_atom_desc(self):
        """Static per-atom df plan — shared with the matrix-free double
        tier; see kernels/df_plan.py (r2 limited this to a single SE/ARD
        kernel; r3 covers the full algebra of df atoms — VERDICT r2
        item 4, parity: gauss_procc.py:152, f64 for every kernel)."""
        from stpy_tpu.kernels.df_plan import df_atom_desc

        return df_atom_desc(self.kernel_object)

    def _df_gram(self, params_dict, a, b, desc):
        """(hi, lo) Gram of the (possibly composite) kernel (shared
        helper: kernels/df_plan.py). In fold_noise (compact-memory) mode
        composite atoms fold strip-wise in place — 2n² + strip peak
        instead of 4n², the piece that lets a 2-atom 32k dense-double
        fit hold one chip."""
        from stpy_tpu.kernels.df_plan import df_gram_from_desc

        return df_gram_from_desc(self.kernel_object, params_dict, a, b,
                                 desc,
                                 strip_fold=4096 if self._fold_noise
                                 else None)

    def _build_df_jits(self):
        HIP = jax.lax.Precision.HIGHEST
        desc = self._df_atom_desc()
        # resolve the plan-aware refinement default (see __init__)
        ir_steps = self._df_refine_steps
        if ir_steps is None:
            ir_steps = 3 if any(d[1] == "generic" for d in desc) else 1
        self._df_refine_steps_resolved = ir_steps

        def fit(x, y, params_dict, s):
            from stpy_tpu.ops.compensated import gemv_df
            from stpy_tpu.ops.pallas_gram_df import _two_sum

            n = x.shape[0]
            Kh, Kl = self._df_gram(params_dict, x, x, desc)
            if self._fold_noise:
                # fold s² + jitter into the df diagonal EXACTLY (TwoSum /
                # TwoProd are error-free), factorize the folded pair, then
                # unfold the jitter — the separate A = Kh + s²I buffer
                # never exists, cutting fit peak from 4n² to 3n² f32
                # buffers (see __init__). All adds below preserve the df
                # value exactly; only the (hi, lo) split is renormalized.
                from stpy_tpu.ops.pallas_gram_df import _two_prod, _two_sum

                base = default_jitter(Kh.dtype)
                s2h, s2e = _two_prod(s, s)
                jit_ = base * (jnp.mean(jnp.diagonal(Kh)) + s2h)
                ch, ce = _two_sum(s2h, jit_)
                i = jnp.arange(n)
                dh, de = _two_sum(Kh[i, i], ch)
                Kh = Kh.at[i, i].set(dh)
                Kl = Kl.at[i, i].add(de + ce + s2e)
                L_ = jnp.linalg.cholesky(Kh)
                ok_ = jnp.all(jnp.isfinite(L_))
                # exact unfold of the jitter: refinement and the qform
                # target A = K + s²I (the jitter lives only in L, exactly
                # like the fold_noise=False path, whose residual excludes
                # it so refinement removes the jitter bias from alpha)
                uh, ue = _two_sum(Kh[i, i], -jit_)
                Kh = Kh.at[i, i].set(uh)
                Kl = Kl.at[i, i].add(ue)
                a_h = cho_solve_blocked(L_, y)
                a_l = jnp.zeros_like(a_h)
                for _ in range(ir_steps):
                    # the folded diagonal already carries s² in df, so the
                    # residual is just y − (K + s²I)·α with one df GEMV
                    Ph, Pl = gemv_df(Kh, Kl, a_h, vl=a_l)
                    rh, re = _two_sum(y, -Ph[:, None])
                    r = rh + (re - Pl[:, None])
                    d = cho_solve_blocked(L_, r)
                    nh, e = _two_sum(a_h, d)
                    a_h, a_l = nh, a_l + e
                alpha = jnp.concatenate([a_h, a_l], axis=1)
                if self._var_refine > 0:
                    return L_, alpha, ok_, jit_, Kh, Kl
                return L_, alpha, ok_, jit_
            if self._jitter_ladder == "recompute":
                # Kh stays live for refinement regardless; rebuilding
                # A = Kh + (s²+j)I per retry saves carrying a second n²
                # buffer across the ladder's while_loop
                scale = jnp.mean(jnp.diagonal(Kh)) + s * s
                res = safe_cholesky_rebuild(
                    lambda j: Kh + (s * s + j) * jnp.eye(n, dtype=Kh.dtype),
                    scale,
                )
                L_, ok_, jit_ = res.L, res.ok, res.jitter
            elif self._jitter_ladder:
                A = Kh + (s * s) * jnp.eye(n, dtype=Kh.dtype)
                res = safe_cholesky(A)
                L_, ok_, jit_ = res.L, res.ok, res.jitter
            else:
                A = Kh + (s * s) * jnp.eye(n, dtype=Kh.dtype)
                # honor jitter_ladder=False here too (r2 ADVICE): the
                # ladder's live pre-jitter Gram is what OOMs 32k fits
                L_ = chol_jittered(A)
                ok_ = jnp.all(jnp.isfinite(L_))
                jit_ = default_jitter(A.dtype) * jnp.mean(jnp.diagonal(A))
            # refinement with an EXACT df residual (gemv_df: TwoProd +
            # pairwise-tree reduction, no accumulator floor), and alpha
            # carried as a DOUBLE-FLOAT pair: a single-f32 alpha caps the
            # posterior mean at eps·‖K*‖‖α‖/‖μ‖ regardless of Gram entry
            # accuracy — measured as the 1.33e-6 se+matern mean plateau
            # that survived the 1e-10 df-entry rework (r3 batch F). The
            # s² term runs in df too (fl(s·s) alone biases r by ~6e-10·‖α‖).
            from stpy_tpu.ops.pallas_gram_df import _two_prod

            a_h = cho_solve_blocked(L_, y)
            a_l = jnp.zeros_like(a_h)
            s2h, s2e = _two_prod(s, s)
            for _ in range(ir_steps):
                Ph, Pl = gemv_df(Kh, Kl, a_h, vl=a_l)
                qh, qe = _two_prod(s2h, a_h)
                qe = qe + (s2e * a_h + s2h * a_l)
                rh, re = _two_sum(y, -Ph[:, None])
                rh, re2 = _two_sum(rh, -qh)
                r = rh + ((re + re2) - Pl[:, None] - qe)
                d = cho_solve_blocked(L_, r)
                nh, e = _two_sum(a_h, d)
                a_h, a_l = nh, a_l + e
            alpha = jnp.concatenate([a_h, a_l], axis=1)     # (n, 2) df pair
            if self._var_refine > 0:
                # var_refine predict consumes the train df Gram — return it
                # so predict doesn't rebuild it (~2 df Pallas Grams/predict
                # otherwise; r3 VERDICT item 6)
                return L_, alpha, ok_, jit_, Kh, Kl
            return L_, alpha, ok_, jit_

        def predict(L, alpha, x, xtest, params_dict, s):
            from stpy_tpu.ops.compensated import gemv_df

            Kh, Kl = self._df_gram(params_dict, xtest, x, desc)  # (t, n)
            # exact df mean GEMV on the df alpha pair (see fit above)
            Mh, Ml = gemv_df(Kh, Kl, alpha[:, :1], vl=alpha[:, 1:])
            mu = (Mh + Ml)[:, None]
            kss = self.kernel_object.diag(xtest, params_dict)
            V = tri_solve_blocked(L, Kh.T, precision=HIP)   # (n, t)
            var = jnp.maximum(kss - jnp.sum(V * V, axis=0), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        def predict_refined(L, alpha, Th, Tl, x, xtest, params_dict, s):
            """var_refine ≥ 1 path (r3): one HIGH cho_solve for W0, then
            the fused df quadratic form q = Σ W0 ⊙ (B + R) — the
            second-order identity q̃ = bᵀA⁻¹b − rᵀA⁻¹r makes the variance
            error second order in W0's solve residual, so no df W
            iteration and no second solve are needed (ops/
            pallas_qform_df.py; replaces the r2 scheme that cost ~2 s and
            two extra n³ solves per pass)."""
            from stpy_tpu.kernels.df_plan import df_diag_from_desc
            from stpy_tpu.ops.compensated import gemv_df
            from stpy_tpu.ops.pallas_gram_df import _two_sum
            from stpy_tpu.ops.pallas_qform_df import qform_refined

            Kh, Kl = self._df_gram(params_dict, xtest, x, desc)  # (t, n)
            Mh, Ml = gemv_df(Kh, Kl, alpha[:, :1], vl=alpha[:, 1:])
            mu = (Mh + Ml)[:, None]
            # k** as a df pair: an f32 k** floors the k** − q cancellation
            # at eps·k**/var — fatal for large-magnitude kernels
            # (polynomial deg-3: k** ≈ 729, measured var rel err 1.3e-1
            # from the f32 k** alone; kappa-normalized families are
            # value-identical either way). See df_diag_from_desc.
            ksh, ksl = df_diag_from_desc(self.kernel_object, params_dict,
                                         xtest, desc)
            # W0 only needs to leave a SMALL residual (error enters q at
            # second order). Default = HIGHEST forward / HIGH backward for
            # EVERY family (r5): the forward pass's rounding is amplified
            # through the whole backward recursion while backward rounding
            # stays local, so the mixed solve is HIGHEST-class accurate at
            # ~the mean cost — measured var identity bias 3.6e-7 matern32
            # (was 9.7e-7 at r4's all-HIGH default, a 7% margin on the
            # 1e-6 bar), 3.8e-7 composite (vs 3.7e-7 all-HIGHEST at +7%
            # wall), n=16k (benchmarks/exp_r5_serving2.py). var_precision
            # overrides BOTH passes (in single mode it picks the trisolve
            # precision, here the W0 solve precision).
            w0_prec = self._var_precision
            w0_bwd = None
            if w0_prec is None:
                w0_prec = jax.lax.Precision.HIGHEST
                w0_bwd = jax.lax.Precision.HIGH
            W0 = cho_solve_blocked(L, Kh.T, precision=w0_prec,
                                   precision_bwd=w0_bwd)
            qh, ql = qform_refined(
                Th, Tl, W0, Kh.T, Kl.T, s,
                main_precision=(self._qform_precision or "ozaki"))
            # df cancellation k** − q: TwoSum keeps the subtraction exact,
            # the lo limbs fold in last
            vh, ve = _two_sum(ksh, -qh)
            var = jnp.maximum(vh + ((ve + ksl) - ql), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        self._fit_fn = jax.jit(fit)
        # the df predicts consume the stored (n, 2) alpha pair, not the
        # (n, 1) hi column kept in self.A for legacy consumers
        if self._var_refine > 0:
            _pjit = jax.jit(predict_refined)
            # fold_noise: the cached train df Gram already carries s² on
            # its diagonal (exact fold, see fit), so the qform's separate
            # s²·W term must be zero — same system either way
            self._predict_fn = lambda L, A, x, xt, pd: _pjit(
                L, self._A_df, self._df_train[0], self._df_train[1], x, xt,
                pd, jnp.asarray(0.0 if self._fold_noise else self.s,
                                x.dtype)
            )

            def fit_predict(x, y, params_dict, s, xtest):
                L_, alpha, ok_, jit_, Th, Tl = fit(x, y, params_dict, s)
                s_q = jnp.zeros_like(s) if self._fold_noise else s
                mu, sd = predict_refined(L_, alpha, Th, Tl, x, xtest,
                                         params_dict, s_q)
                return (L_, alpha, ok_, jit_, Th, Tl), (mu, sd)
        else:
            _pjit = jax.jit(predict)
            self._predict_fn = lambda L, A, x, xt, pd: _pjit(
                L, self._A_df, x, xt, pd, jnp.asarray(self.s, x.dtype)
            )

            def fit_predict(x, y, params_dict, s, xtest):
                L_, alpha, ok_, jit_ = fit(x, y, params_dict, s)
                mu, sd = predict(L_, alpha, x, xtest, params_dict, s)
                return (L_, alpha, ok_, jit_), (mu, sd)
        self._fit_predict_fn = jax.jit(fit_predict)

    def _build_jits(self):
        kernel = self.kernel_object

        def fit(x, y, params_dict, s):
            n = x.shape[0]
            if self._jitter_ladder == "recompute":
                # recompute-over-residency ladder: the retry body closes
                # over (x, params) and re-materializes the jittered Gram,
                # so the pre-jitter K is never carried across the
                # while_loop (the ~3n² residency that OOMs laddered 32k
                # fits on one 16 GB chip)
                def build(j):
                    K = kernel.eval_params(params_dict, x, x)
                    return K + (s * s + j) * jnp.eye(n, dtype=K.dtype)

                scale = jnp.mean(kernel.diag(x, params_dict)) + s * s
                res = safe_cholesky_rebuild(build, scale)
                L, ok, jitter = res.L, res.ok, res.jitter
                alpha = cho_solve(L, y)
                return L, alpha, ok, jitter
            K = kernel.eval_params(params_dict, x, x)
            # no (K+K.T)/2 symmetrization: Cholesky reads only the lower
            # triangle and the fused Gram is symmetric by construction —
            # skipping it saves two full HBM passes over the n x n matrix
            K = K + (s * s) * jnp.eye(n, dtype=K.dtype)
            if self._jitter_ladder:
                res = safe_cholesky(K)
                L, ok, jitter = res.L, res.ok, res.jitter
            else:
                L = chol_jittered(K)
                ok = jnp.all(jnp.isfinite(L))
                # report what chol_jittered actually adds (base * mean diag),
                # matching safe_cholesky's scaled report (r2 ADVICE)
                jitter = (default_jitter(K.dtype)
                          * jnp.mean(jnp.diagonal(K))).astype(K.dtype)
            alpha = cho_solve(L, y)
            # solver status surfaced as data, not exceptions (SURVEY §5)
            return L, alpha, ok, jitter

        def predict(L, alpha, x, xtest, params_dict):
            K_star = kernel.eval_params(params_dict, xtest, x)  # (t, n)
            mu = K_star @ alpha
            # blocked GEMM trisolve: ~5x XLA's native trisolve at wide RHS
            V = tri_solve_blocked(
                L, K_star.T, precision=self._var_precision
            )                                                   # (n, t)
            kss = kernel.diag(xtest, params_dict)
            var = jnp.maximum(kss - jnp.sum(V * V, axis=0), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        def predict_full(L, alpha, x, xtest, params_dict):
            K_star = kernel.eval_params(params_dict, xtest, x)
            mu = K_star @ alpha
            V = tri_solve_blocked(L, K_star.T)
            Kss = kernel.eval_params(params_dict, xtest, xtest)
            cov = Kss - V.T @ V
            return mu, cov

        def fit_predict(x, y, params_dict, s, xtest):
            L, alpha, ok, jitter = fit(x, y, params_dict, s)
            mu, sd = predict(L, alpha, x, xtest, params_dict)
            return (L, alpha, ok, jitter), (mu, sd)

        self._fit_fn = jax.jit(fit)
        self._predict_fn = jax.jit(predict)
        self._predict_full_fn = jax.jit(predict_full)
        self._fit_predict_fn = jax.jit(fit_predict)
        if self._precision == "double":
            self._build_df_jits()  # overrides fit/predict, keeps full-cov

    def _pd(self):
        """Call-time params for the jitted fits/predicts: the df tier gets
        the lo-limb-augmented dict (KernelFunction.params_with_lo) so
        f32-inexact hyperparameters like γ=1.1 keep their f64 meaning
        through the df Gram (the 2e-8 γ-rounding shift was the r3 'matern
        anomaly' — benchmarks/exp_r4_anomaly.py); built OUTSIDE jit, the
        lo leaves are ordinary traced args so refits don't retrace."""
        if self._precision == "double":
            return self.kernel_object.params_with_lo()
        return self.kernel_object.params_dict

    def fit_gp(self, x, y, Sigma=None, iterative=False, extrapoint=False):
        """Fit the GP: Gram + jittered Cholesky + solve. `Sigma` optionally
        gives a per-point noise std matrix (K += Σ^TΣ as in
        gauss_procc.py:163); default is isotropic s."""
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.n, self.d = x.shape
        self.x, self.y = x, y
        # release the previous fit's factors BEFORE computing the new ones:
        # holding the old (n, n) L across a refit adds a full n² to the
        # peak (measured: the 32k recompute-ladder refit OOMs a 16 GB chip
        # with the stale factor live, fits without it — r3 batch Z)
        self.L = self.A = None
        self._A_df = None
        self._df_train = None
        self.fitted = False
        if self._fit_fn is None:
            self._build_jits()
        if Sigma is None:
            out = self._fit_fn(
                x, y, self._pd(), jnp.asarray(self.s, x.dtype),
            )
            self.L, self.A, chol_ok, jitter_used = out[:4]
            if self._precision == "double":
                # the df fit returns alpha as an (n, 2) double-float pair;
                # keep self.A = (n, 1) hi column for every legacy consumer
                # (norms, samplers) and stash the pair for the df predict
                self._A_df = self.A
                self.A = self._A_df[:, :1]
            if len(out) == 6:   # double + var_refine: cached train df Gram
                self._df_train = (out[4], out[5])
            self.fit_status = {
                "cholesky_ok": bool(chol_ok),
                "jitter_used": float(jitter_used),
                "n": int(self.n),
            }
        else:
            if self._precision == "double":
                # the df fit/predict pipeline models isotropic s only —
                # raising beats silently serving a stale _A_df pair (the
                # df predict would pair the new L with the previous fit's
                # alpha) or a quiet precision downgrade
                raise NotImplementedError(
                    "per-point Sigma noise is not supported with "
                    "precision='double' (the df fit models isotropic s "
                    "only); use precision='single'"
                )
            Sigma = as_array(Sigma)
            K = self.kernel_object.gram(x) + Sigma.T @ Sigma
            if self._jitter_ladder:
                res = safe_cholesky(K)
                L, ok, jitter = res.L, res.ok, res.jitter
            else:
                L = chol_jittered(K)
                ok = jnp.all(jnp.isfinite(L))
                jitter = (default_jitter(K.dtype)
                          * jnp.mean(jnp.diagonal(K))).astype(K.dtype)
            self.L, self.A = L, cho_solve(L, y)
            self.fit_status = {
                "cholesky_ok": bool(ok),
                "jitter_used": float(jitter),
                "n": int(self.n),
            }
        if self.loss != "squared":
            self.A = self._robust_alpha()
            if self._precision == "double":
                # robust MAP alpha replaces the refined one; the df mean
                # GEMV consumes it with a zero lo stream (the 1e-6 parity
                # story applies to the squared loss only)
                self._A_df = jnp.concatenate(
                    [self.A, jnp.zeros_like(self.A)], axis=1)
        self.fitted = True
        return None

    def fit(self, x=None, y=None):
        if x is not None:
            self.fit_gp(x, y)
        else:
            self.fit_gp(self.x, self.y)

    def fit_predict(self, x, y, xtest):
        """Fused fit + posterior (mu, std): the whole Gram → Cholesky →
        solve → cross-Gram → mean/variance pipeline runs as ONE compiled
        XLA program — one host dispatch instead of two (~31 ms each
        through this tunnel) and the compiler can overlap independent
        stages (e.g. the test cross-Gram with the factorization). State
        is stored exactly as after fit_gp(x, y), so mean_std/sample keep
        working afterwards. Robust losses fall back to the two-call path.
        Parity note: the reference has no fused call (fit_gp
        gauss_procc.py:136 + mean_std :310 are always separate); this is
        TPU dispatch-floor engineering for the serving path."""
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        xtest = as_array(xtest)
        if self.loss != "squared":
            self.fit_gp(x, y)
            return self.mean_std(xtest)
        self.n, self.d = x.shape
        self.x, self.y = x, y
        # release stale factors before the fused refit (see fit_gp)
        self.L = self.A = None
        self._A_df = None
        self._df_train = None
        self.fitted = False
        if self._fit_fn is None:
            self._build_jits()
        out, (mu, sd) = self._fit_predict_fn(
            x, y, self._pd(), jnp.asarray(self.s, x.dtype), xtest,
        )
        self.L, self.A, chol_ok, jitter_used = out[:4]
        if self._precision == "double":
            self._A_df = self.A
            self.A = self._A_df[:, :1]
        if len(out) == 6:
            self._df_train = (out[4], out[5])
        self.fit_status = {
            "cholesky_ok": bool(chol_ok),
            "jitter_used": float(jitter_used),
            "n": int(self.n),
        }
        self.fitted = True
        return mu, sd

    def add_data_point(self, x, y, Sigma=None):
        x, y = as_array(x), as_array(y).reshape(-1, 1)
        if self.x is not None:
            self.x = jnp.concatenate([self.x, x], axis=0)
            self.y = jnp.concatenate([self.y, y], axis=0)
        else:
            self.x, self.y = x, y
        self.fit_gp(self.x, self.y, Sigma=Sigma)

    # -- robust-loss alpha fits (replace cvxpy/MOSEK; gauss_procc.py:211-289) --
    def _loss_objective(self, K, y):
        s, lam = self.s, self.lam
        if self.loss == "huber":
            delta = self.huber_delta

            def obj(alpha):
                r = (K @ alpha - y.ravel()) / s
                a = jnp.abs(r)
                hub = jnp.where(a <= delta, 0.5 * a**2, delta * (a - 0.5 * delta))
                return jnp.sum(hub) + lam * alpha @ (K @ alpha)

            return obj
        if self.loss == "svr":
            eps_i = self.svr_eps

            def obj(alpha):
                r = jnp.abs(K @ alpha - y.ravel()) - eps_i
                # smoothed hinge (softplus sharpness 50) — keeps L-BFGS happy
                return jnp.sum(jax.nn.softplus(50.0 * r) / 50.0) + lam * alpha @ (
                    K @ alpha
                )

            return obj
        if self.loss in ("unif", "unif_new"):
            con = (
                2 * self.total_bound * self.prob
                / ((1 - self.prob) * np.sqrt(2 * np.pi * s**2))
            )

            def obj(alpha):
                r = (K @ alpha - y.ravel()) ** 2 / (2 * s**2)
                return jnp.sum(jax.nn.softplus(r + np.log(con))) + lam * (
                    alpha @ alpha
                )

            return obj
        raise AssertionError("Loss function not implemented.")

    def _robust_alpha(self):
        K = self.kernel_object.gram(self.x)
        obj = self._loss_objective(K, self.y)
        res = minimize_lbfgs(obj, jnp.zeros(self.n, K.dtype), max_iter=500)
        return res.x[:, None]

    # -- prediction ------------------------------------------------------------
    def execute(self, xtest):
        xtest = as_array(xtest)
        K_star = (
            self.kernel_object.cross(self.x, xtest).T if self.fitted else None
        )
        K_star_star = self.kernel_object.gram(xtest)
        return (K_star, K_star_star)

    def mean_std(self, xtest, full=False, reuse=False):
        xtest = as_array(xtest)
        if not self.fitted:
            kd = self.kernel_object.diag(xtest)
            zero = jnp.zeros((xtest.shape[0], 1), xtest.dtype)
            if full:
                return zero, self.kernel_object.gram(xtest)
            return zero, jnp.sqrt(kd)[:, None]
        if full:
            return self._predict_full_fn(
                self.L, self.A, self.x, xtest,
                self.kernel_object.params_dict
            )
        return self._predict_fn(
            self.L, self.A, self.x, xtest, self._pd()
        )

    def mean(self, xtest):
        return self.mean_std(xtest)[0]

    def residuals(self, x, y):
        return self.mean(x) - as_array(y).reshape(-1, 1)

    def norm(self):
        if not self.fitted:
            return None
        K = self.kernel_object.gram(self.x)
        return jnp.sqrt(self.A.T @ K @ self.A)[0, 0]

    def beta(self, delta=1e-3, norm=1):
        """Concentration parameter (parity: gauss_procc.py:186-193, computed
        via Cholesky logdet instead of det for stability)."""
        logdet = logdet_from_chol(self.L)
        inner = 1.0 / delta + (logdet - 2 * self.n * jnp.log(self.s))
        return self.s * norm + jnp.sqrt(2.0 * jnp.log(jnp.maximum(inner, 1.0 + 1e-9)))

    def ucb(self, xtest):
        mu, s = self.mean_std(xtest)
        return mu + self.beta_mult * s

    def lcb(self, xtest):
        mu, s = self.mean_std(xtest)
        return mu - self.beta_mult * s

    # -- sampling ---------------------------------------------------------------
    def sample(self, xtest, size=1, jitter=1e-8, key=None):
        """Posterior (or prior if unfitted) path samples on a grid."""
        xtest = as_array(xtest)
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        nn = xtest.shape[0]
        if self.fitted:
            mean, cov = self.mean_std(xtest, full=True)
        else:
            mean = jnp.zeros((nn, 1), xtest.dtype) + self.mu
            cov = self.kernel_object.gram(xtest)
        L = safe_cholesky(cov, jitter=jitter).L
        z = jax.random.normal(key, (nn, size), dtype=xtest.dtype)
        return mean + L @ z

    def sample_and_max(self, xtest, size=1, key=None):
        f = self.sample(xtest, size=size, key=key)
        idx = jnp.argmax(f, axis=0)
        val = jnp.max(f, axis=0)
        return (as_array(xtest)[idx, :], val)

    def sample_iteratively_max(self, xtest, multistart=20,
                               minimizer="coordinate-wise", grid=100,
                               key=None):
        """Thompson-style iterative max sampling (parity:
        gauss_procc.py:985-1085).

        Grid mode: the reference's probe-by-probe sequential conditioning is
        mathematically identical to drawing ONE joint posterior path and
        taking its argmax — which is a single Cholesky here.
        Grid-free mode: coordinate-wise maximization of an incrementally
        conditioned fantasy sample (fantasies appended per axis sweep)."""
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        if xtest is not None:
            return self.sample_and_max(xtest, size=1, key=key)

        bounds = (
            jnp.asarray(self.bounds, default_dtype()).reshape(self.d, 2)
            if self.bounds is not None
            else jnp.asarray(
                [[-self.diameter, self.diameter]] * self.d, default_dtype()
            )
        )
        xold, yold = self.x, self.y
        results = []
        for _ in range(multistart):
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (self.d,), default_dtype())
            x0 = bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])
            solution = x0
            last_val = None
            for i in range(self.d):
                line = jnp.tile(solution[None, :], (grid, 1))
                line = line.at[:, i].set(
                    jnp.linspace(bounds[i, 0], bounds[i, 1], grid)
                )
                key, sub = jax.random.split(key)
                fsample = self.sample(line, size=1, key=sub)
                # condition on the fantasized line (parity :1050-1056)
                self.x = jnp.concatenate([self.x, line], axis=0)
                self.y = jnp.concatenate([self.y, fsample], axis=0)
                self.fit_gp(self.x, self.y)
                idx = jnp.argmax(fsample[:, 0])
                solution = solution.at[i].set(line[idx, i])
                last_val = fsample[idx, 0]
            results.append((solution, last_val))
            self.fit_gp(xold, yold)
        best = int(np.argmax([float(v) for _, v in results]))
        sol, val = results[best]
        self.fit_gp(xold, yold)
        return sol[None, :], val

    def log_probability(self, xtest, sample):
        mu, cov = self.mean_std(xtest, full=True)
        n = mu.shape[0]
        res = safe_cholesky(cov)
        diff = as_array(sample).reshape(-1, 1) - mu
        alpha = cho_solve(res.L, diff)
        return float(
            -0.5 * (diff.T @ alpha)[0, 0]
            - 0.5 * logdet_from_chol(res.L)
            - 0.5 * n * jnp.log(2 * jnp.pi)
        )

    # -- evidence ---------------------------------------------------------------
    def log_marginal(self, kernel, X, weight=1.0):
        if self.loss == "squared":
            return self._log_marginal_squared(kernel, X, weight)
        return self._log_marginal_map(kernel, X, weight)

    def _log_marginal_squared(self, kernel, X, weight):
        return self.log_marginal_params(kernel, X, self.s, weight)

    def _log_marginal_map(self, kernel, X, weight):
        """MAP/Laplace evidence for robust losses via Danskin's theorem
        (parity: gauss_procc.py:579-627): inner argmin is a stop-gradient,
        outer gradient flows through the objective and the Laplace logdet."""
        x, y = self.x, self.y
        n = x.shape[0]
        jitter = 1e-4
        K = kernel.eval_params(X, x, x)
        K = 0.5 * (K + K.T) + jitter * jnp.eye(n, dtype=K.dtype)
        obj = self._loss_objective(K, y)
        sol = minimize_lbfgs(obj, jnp.zeros(n, K.dtype), max_iter=300)
        alpha = jax.lax.stop_gradient(sol.x)
        H = jax.hessian(obj)(alpha)
        H = H + 1e-8 * jnp.eye(n, dtype=K.dtype)
        logdet = -0.5 * jnp.linalg.slogdet(H)[1] * weight
        logprob = -0.5 * obj(alpha) + logdet
        return -logprob

    # -- hyperparameter presets (parity: gauss_procc.py:640-697) ----------------
    def optimize_params(
        self, type="bandwidth", restarts=10, regularizer=None, maxiter=200,
        mingradnorm=1e-6, verbose=False, optimizer="lbfgs", scale=1.0,
        weight=1.0, save=False, save_name="model.np", init_func=None,
        bounds=None, parallel=False, cores=None, key=None, **hyperopt_kwargs,
    ):
        regularizer_func = None
        if regularizer is not None:
            kind, lam_r = regularizer[0], regularizer[1]
            if kind == "spectral_norm":
                regularizer_func = lambda xf: lam_r * jnp.sum(
                    jnp.abs(1.0 / jnp.exp(xf))
                )
            elif kind == "lasso":
                regularizer_func = lambda xf: lam_r * jnp.sum(
                    jnp.abs(1.0 / jnp.exp(xf))
                )

        params = {}
        if type == "bandwidth":
            for pkey, d2 in self.kernel_object.params_dict.items():
                if "gamma" in d2:
                    params[pkey] = {"gamma": (init_func, None, bounds)}
                elif "ard_gamma" in d2:
                    params[pkey] = {"ard_gamma": (init_func, None, bounds)}
        elif type == "bandwidth+noise":
            for pkey, d2 in self.kernel_object.params_dict.items():
                if "gamma" in d2:
                    params[pkey] = {"gamma": (init_func, None, bounds)}
                elif "ard_gamma" in d2:
                    params[pkey] = {"ard_gamma": (init_func, None, bounds)}
            params["likelihood"] = {"sigma": ((lambda sz: self.s), None, None)}
        elif type == "kappa":
            for pkey, d2 in self.kernel_object.params_dict.items():
                if "kappa" in d2:
                    params[pkey] = {"kappa": (init_func, None, bounds)}
        elif type in ("covariance", "rots"):
            # manifold-constrained: PSD factor (covariance) or Stiefel
            # rotation (rots) of the full-covariance kernel's `cov` param
            # (parity: gauss_procc.py:669-689, pymanopt there)
            return self._optimize_cov_manifold(
                type, restarts=restarts, maxiter=maxiter, weight=weight,
                key=key,
            )
        elif type == "groups":
            from stpy_tpu.utils.groups import generate_groups

            optimizer = "discrete"
            d = self.kernel_object.d
            for pkey, d2 in self.kernel_object.params_dict.items():
                if self.kernel_object._atoms[int(pkey)].static.get("groups"):
                    params[pkey] = {"groups": (None, generate_groups(d), None)}
        else:
            raise AttributeError("This quick-optimization is not implemented.")

        return self.optimize_params_general(
            params=params, restarts=restarts, optimizer=optimizer,
            regularizer_func=regularizer_func, maxiter=maxiter,
            mingradnorm=mingradnorm, verbose=verbose, scale=scale,
            weight=weight, save=save, save_name=save_name, key=key,
            **hyperopt_kwargs,
        )

    # -- BO acquisition (parity: gauss_procc.py:918-1085) -----------------------
    def ucb_optimize(self, beta=2.0, multistart=25, lcb=False, key=None,
                     steps=200, lr=0.05):
        """Maximize mu ± beta·sigma over self.bounds with vmapped multistart
        projected Adam (replaces the scipy L-BFGS-B per-start loop)."""
        assert self.bounds is not None, "ucb_optimize needs box bounds"
        bounds = jnp.asarray(self.bounds, default_dtype()).reshape(self.d, 2)
        key = key if key is not None else jax.random.PRNGKey(7)
        sign = -1.0 if lcb else 1.0
        L, A, x, pd = self.L, self.A, self.x, self.kernel_object.params_dict
        kernel = self.kernel_object

        def acq(pt):
            K_star = kernel.eval_params(pd, pt[None, :], x)
            mu = (K_star @ A)[0, 0]
            V = tri_solve(L, K_star.T, lower=True)
            kss = kernel.diag(pt[None, :], pd)[0]
            var = jnp.maximum(kss - jnp.sum(V * V), 1e-30)
            return sign * mu + beta * jnp.sqrt(var)

        g = jax.grad(acq)

        def ascend(pt0):
            def body(pt, _):
                pt = pt + lr * g(pt)
                pt = jnp.clip(pt, bounds[:, 0], bounds[:, 1])
                return pt, None

            pt, _ = jax.lax.scan(body, pt0, None, length=steps)
            return pt, acq(pt)

        u = jax.random.uniform(
            key, (multistart, self.d), dtype=default_dtype()
        )
        starts = bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])
        pts, vals = jax.jit(jax.vmap(ascend))(starts)
        best = jnp.argmax(vals)
        return pts[best], sign * vals[best]

    # -- adversarially robust "volume" mean (gauss_procc.py:710-896) -----------
    def volume_mean(self, xtest, weights=None, eps=1e-1, tol=1e-6,
                    max_iter=1000, verbose=False, scale=None, slope=1.0,
                    relax="relu", B="auto", bisections=10,
                    optimize_scale=False):
        """Adversarially-robust mean: find the minimum-RKHS-norm function β
        that stays within an ε-band of as much (weighted) data as possible,

            min_β Σ_i w_i ρ(slope·(|β_i - y_i| - ε)) + (scale/2)·βᵀK⁻¹β,

        with ρ = relu (exact elementwise prox; FISTA) or logistic (smooth;
        L-BFGS), and `scale` set by bisection so βᵀK⁻¹β matches the budget B
        (parity: volume_mean / volume_mean_cvxpy, cvxpy+MOSEK + torch
        proximal loop in the reference)."""
        xtest = as_array(xtest)
        n = self.n
        K = self.kernel_object.gram(self.x) + 1e-6 * jnp.eye(
            self.n, dtype=self.x.dtype
        )
        L = safe_cholesky(K).L
        yv = self.y.ravel()
        w = (
            jnp.ones(n, yv.dtype) / n
            if weights is None else as_array(weights).ravel()
        )

        def quad(beta):
            return beta @ cho_solve(L, beta.reshape(-1, 1)).ravel()

        if B == "auto":
            alpha0 = cho_solve(L, self.y)
            beta0 = K @ alpha0
            B = float(quad(beta0.ravel()))

        def fit_beta(scale_arg):
            if relax == "relu":
                from stpy_tpu.opt.prox import fista_prox_backtracking

                def smooth(beta):
                    return 0.5 * scale_arg * quad(beta)

                def prox(beta, step):
                    # prox of step·w·slope·relu(|t - y| - ε): shrink toward
                    # the ε-band, exact and elementwise
                    r = beta - yv
                    mag = jnp.abs(r)
                    excess = jnp.maximum(mag - eps, 0.0)
                    shrink = jnp.minimum(step * w * slope, excess)
                    return beta - jnp.sign(r) * shrink

                res = fista_prox_backtracking(
                    smooth, yv, prox, max_iter=max_iter, tol=tol
                )
                return res.x
            # logistic relax: smooth, L-BFGS
            def obj(beta):
                t = slope * (jnp.abs(beta - yv) - eps)
                return jnp.sum(w * jax.nn.softplus(t)) + (
                    0.5 * scale_arg * quad(beta)
                )

            return minimize_lbfgs(obj, yv, max_iter=max_iter).x

        if scale is None or optimize_scale:
            from stpy_tpu.opt.scalar import bisection as bisect_fn

            def gap(s_arg):
                return quad(fit_beta(jnp.maximum(s_arg, 1e-8))) - B

            scale = float(
                bisect_fn(gap, 1e-6, 1.0, iters=bisections)
            )
            if optimize_scale:
                return scale

        beta = fit_beta(scale)
        alpha = cho_solve(L, beta.reshape(-1, 1))
        return self.kernel_object.cross(xtest, self.x) @ alpha

    volume_mean_cvxpy = volume_mean  # reference name (cvxpy path) alias

    def volume_mean_norm(self, xtest, **kwargs):
        """Normalized-weights variant (parity gauss_procc.py:847)."""
        w = kwargs.pop("weights", None)
        if w is not None:
            w = as_array(w).ravel()
            w = w / jnp.maximum(jnp.sum(w), 1e-12)
        return self.volume_mean(xtest, weights=w, **kwargs)

    def _optimize_cov_manifold(self, type, restarts=4, maxiter=200,
                               weight=1.0, key=None):
        """Optimize the full-covariance kernel's `cov` over the PSD manifold
        (type='covariance', A = Y Yᵀ factor L-BFGS) or the Stiefel manifold
        (type='rots', projected GD with QR retraction)."""
        from stpy_tpu.opt.manifold import optimize_psd, optimize_stiefel

        kernel = self.kernel_object
        target_key = None
        for pkey, d2 in kernel.params_dict.items():
            if "cov" in d2:
                target_key = pkey
        if target_key is None:
            raise AttributeError(
                "No `cov` kernel parameter to optimize (use a "
                "full_covariance_* kernel)."
            )
        d = kernel.params_dict[target_key]["cov"].shape[0]

        def objective(C):
            return self.log_marginal_params(
                kernel, {target_key: {"cov": C}}, self.s, weight
            )

        if type == "covariance":
            C_opt, _ = optimize_psd(
                objective, d, restarts=restarts, key=key, max_iter=maxiter
            )
        else:
            C_opt, _ = optimize_stiefel(
                objective, d, d, restarts=restarts, key=key, steps=maxiter
            )
        kernel.params_dict[target_key]["cov"] = C_opt
        self.fitted = False
        self.fit_gp(self.x, self.y)
        return True

    def isin(self, xnext, epsilon=1e-3):
        """True iff `xnext` is within `epsilon` (L2) of an existing training
        point (parity: gauss_procc.py:965-969; vectorized instead of the
        reference's per-row loop)."""
        if self.x is None:
            return False
        xnext = as_array(xnext).reshape(1, -1)
        return bool(
            jnp.any(jnp.linalg.norm(self.x - xnext, axis=1) < epsilon)
        )

    def _pointwise_posterior_fns(self):
        """Differentiable single-point posterior mean/variance closures on
        the STORED factor/alpha — used by the gradient helpers instead of
        mean_std: the double-mode predict runs through the df Pallas Gram,
        which has no VJP rule on TPU (reverse-mode would raise), and
        gradients never need df accuracy (the f32 alpha hi column is off
        by ~1e-7 relative, far below autodiff's use cases here)."""
        ko = self.kernel_object
        pd = ko.params_dict
        A = self.A

        def mu_fn(pt):
            K_star = ko.eval_params(pd, pt[None, :], self.x)
            return (K_star @ A)[0, 0]

        def var_fn(pt):
            K_star = ko.eval_params(pd, pt[None, :], self.x)
            v = tri_solve(self.L, K_star.T)
            kss = ko.diag(pt[None, :], pd)[0]
            return kss - jnp.sum(v * v)

        return mu_fn, var_fn

    def gradient_mean_var(self, point, hessian=True):
        """Gradient of the posterior mean and (optionally) the Hessian-form
        variance object at a single point (parity: gauss_procc.py:416-444;
        autodiff instead of hand-assembled kernel derivatives)."""
        point = as_array(point).reshape(-1)
        mu_fn, var_fn = self._pointwise_posterior_fns()
        nabla_mu = jax.grad(mu_fn)(point)
        if not hessian:
            return nabla_mu
        # reverse-over-reverse: the fused Pallas Gram has a custom_vjp
        # only (no jvp), so jax.hessian's forward-over-reverse would raise
        V = jax.jacrev(jax.grad(var_fn))(point)
        return [nabla_mu, V]

    # gradient of the posterior mean (parity: gauss_procc.py:446-459, autodiff)
    def mean_gradient_hessian(self, xtest, hessian=False):
        xtest = as_array(xtest).reshape(-1)
        mu_fn, _ = self._pointwise_posterior_fns()
        nabla = jax.grad(mu_fn)(xtest)
        if not hessian:
            return nabla
        return [nabla, jax.jacrev(jax.grad(mu_fn))(xtest)]
