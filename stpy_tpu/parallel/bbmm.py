"""Matrix-free evidence (log-marginal) value and gradients — BBMM-style
inference: everything is CG solves + Hutchinson/SLQ probes against lazy
Gram matvecs, so hyperparameter optimization runs at n far beyond what a
dense Cholesky can hold (GPyTorch's BBMM recipe, built TPU-native).

For A(θ) = Σ_a κ_a·K̃_a(γ_a) + σ²I  (any SUM of fused-Pallas atoms — SE /
ARD / Matérn, each optionally on a coordinate group):

    ∂NLL/∂θ = −½ αᵀ(∂A/∂θ)α + ½ tr(A⁻¹ ∂A/∂θ),   α = A⁻¹y

* scalar lengthscales use the fused derivative-shape matvec k'(sq)·sq
  (ops/pallas_gram_matvec._dshape_fn) — one extra pass per atom;
* per-dim (ARD) lengthscales decompose the squared distance per coordinate:
  αᵀ(k'∘sq_c)α = 2(α∘x̃_c²)ᵀK'α − 2(α∘x̃_c)ᵀK'(α∘x̃_c), so the whole
  per-dim gradient is ONE fused multi-RHS K' pass over d+1 columns
  (trace terms: 2d+1 column blocks);
* the trace term uses Rademacher probes, all solved in ONE block CG;
* the NLL value itself uses SLQ for the logdet.

Kernels outside the fused families (products, additive groups, laplace,
gibbs, …) use `evidence_value_and_grad_general`: the same identities with
the ∂A terms produced by AUTODIFF through a row-chunked Gram surrogate
(parallel/lazy_kernel.make_chunked_matvec) — O(n·chunk) memory, any kernel
the library can build.

Gradients here are EXACT analytic formulas evaluated with stochastic trace
estimation — not autodiff through the CG while_loop (which reverse-mode
cannot cross).

New capability vs the reference (torch f64 slogdet at gauss_procc.py:631-638
— dense only); generality parity with its any-kernel hyperopt
(stpy/estimator.py:141-223, stpy/kernels.py:76-94,552).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from stpy_tpu.ops.pallas_gram_matvec import (
    gram_matmat,
    gram_matvec,
)
from stpy_tpu.parallel.iterative import cg_solve, cg_solve_block
from stpy_tpu.parallel.slq import slq_logdet


# ---------------------------------------------------------------------------
# per-atom gradient pieces
# ---------------------------------------------------------------------------

def _atom_quad_gamma(xa, alpha, gamma, kappa, family, nu):
    """−½ αᵀ(∂A/∂γ)α for one atom; scalar γ -> scalar, (d,) γ -> (d,)."""
    if jnp.ndim(gamma) == 0:
        dv = (-2.0 / gamma) * gram_matvec(
            xa, xa, alpha, family=family, gamma=gamma, kappa=kappa, nu=nu,
            deriv=True,
        )
        return -0.5 * (alpha @ dv)
    xs = xa / gamma
    Va = jnp.concatenate([alpha[:, None], alpha[:, None] * xs], axis=1)
    U = gram_matmat(xa, xa, Va, family=family, gamma=gamma, kappa=kappa,
                    nu=nu, shape="dk")                     # κ·k'(sq) block
    t1 = jnp.einsum("i,id,i->d", alpha, xs * xs, U[:, 0])
    t2 = jnp.einsum("id,id->d", alpha[:, None] * xs, U[:, 1:])
    bracket = 2.0 * t1 - 2.0 * t2        # αᵀ(κk'∘sq_c)α, symmetry-folded
    return -0.5 * (-2.0 / gamma) * bracket


def _atom_trace_gamma(xa, W, Z, gamma, kappa, family, nu):
    """tr(A⁻¹ ∂A/∂γ) estimate mean_p w_pᵀ(∂A/∂γ)z_p for one atom."""
    r = Z.shape[1]
    if jnp.ndim(gamma) == 0:
        dAZ = (-2.0 / gamma) * gram_matmat(
            xa, xa, Z, family=family, gamma=gamma, kappa=kappa, nu=nu,
            shape="dk_sq",
        )
        return jnp.mean(jnp.sum(W * dAZ, axis=0))
    xs = xa / gamma
    n, d = xs.shape
    blocks = [Z]
    for c in range(d):
        blocks.append(Z * xs[:, c:c + 1])
    for c in range(d):
        blocks.append(Z * (xs[:, c:c + 1] ** 2))
    V = jnp.concatenate(blocks, axis=1)                    # (n, r(2d+1))
    U = gram_matmat(xa, xa, V, family=family, gamma=gamma, kappa=kappa,
                    nu=nu, shape="dk")
    U0 = U[:, :r]
    U1 = U[:, r:r * (1 + d)].reshape(n, d, r)
    U2 = U[:, r * (1 + d):].reshape(n, d, r)
    t1 = jnp.einsum("ip,id,ip->d", W, xs * xs, U0)
    t2 = jnp.einsum("ip,id,idp->d", W, xs, U1)
    t3 = jnp.einsum("ip,idp->d", W, U2)
    return (-2.0 / gamma) * (t1 - 2.0 * t2 + t3) / r


# ---------------------------------------------------------------------------
# sum-of-fused-atoms evidence
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _evg_core(desc, probes, lanczos_iters, cg_tol, cg_maxiter,
              compute_value, probe_tol, probe_maxiter, precond_rank):
    """One compiled program per static config: hyperparameters are TRACED
    arguments, so a gradient-descent loop over (γ_a, κ_a, σ) reuses the
    compiled step (measured 22.8 s → ~1.5 s per warm step at n = 65k).
    `desc` = tuple of (family, nu, group|None) per atom."""

    @jax.jit
    def core(x, yv, gammas, kappas, noise, key):
        return _evidence_body_sum(
            x, yv, gammas, kappas, noise, key, desc=desc,
            probes=probes, lanczos_iters=lanczos_iters, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, compute_value=compute_value,
            probe_tol=probe_tol, probe_maxiter=probe_maxiter,
            precond_rank=precond_rank,
        )

    return core


def _sum_cross_gram(xs_atoms, desc, gammas, kappas, idx, dtype):
    """K[:, idx] for A's kernel part (Σ_a κ_a K_a) — the (n, r) landmark
    cross-Gram feeding the Nyström preconditioner. Direct VPU formulas via
    the same shape functions as the Pallas Gram, so it is consistent with
    the matvec to roundoff."""
    from stpy_tpu.ops.pallas_gram import _shape_fn

    C = None
    for (fam, nu, _), xa, g, k in zip(desc, xs_atoms, gammas, kappas):
        xs = xa / g
        ys = xs[idx]
        sq = jnp.maximum(
            jnp.sum(xs * xs, axis=1)[:, None]
            + jnp.sum(ys * ys, axis=1)[None, :]
            - 2.0 * (xs @ ys.T),
            0.0,
        )
        Ca = (k * _shape_fn(fam, float(nu))(sq)).astype(dtype)
        C = Ca if C is None else C + Ca
    return C


def _evidence_body_sum(
    x, yv, gammas, kappas, noise, key, *, desc, probes, lanczos_iters,
    cg_tol, cg_maxiter, compute_value, probe_tol, probe_maxiter,
    precond_rank=0,
):
    n = yv.shape[0]
    xs_atoms = [
        x if grp is None else x[:, jnp.asarray(grp)] for (_, _, grp) in desc
    ]

    def Av(v):
        v = v.reshape(-1)
        out = (noise * noise) * v
        for (fam, nu, _), xa, g, k in zip(desc, xs_atoms, gammas, kappas):
            out = out + gram_matvec(xa, xa, v, family=fam, gamma=g,
                                    kappa=k, nu=nu)
        return out

    def Amm(V):
        out = (noise * noise) * V
        for (fam, nu, _), xa, g, k in zip(desc, xs_atoms, gammas, kappas):
            out = out + gram_matmat(xa, xa, V, family=fam, gamma=g,
                                    kappa=k, nu=nu)
        return out

    M_inv = None
    if precond_rank > 0:
        from stpy_tpu.parallel.iterative import rayleigh_nystrom_precond

        # landmark-sketch Rayleigh EVD: landmark columns for range
        # coverage, Rayleigh compression QᵀKQ for junk-proof eigenvalues
        # (see rayleigh_nystrom_precond for the measured failure ladder
        # of the inverse-lift and Gaussian-sketch alternatives)
        r = int(min(precond_rank, n))
        idx = jax.random.choice(jax.random.fold_in(key, 7), n, (r,),
                                replace=False)
        C = _sum_cross_gram(xs_atoms, desc, gammas, kappas, idx, yv.dtype)
        M_inv = rayleigh_nystrom_precond(C, Amm, noise)

    alpha, _, _ = cg_solve(Av, yv, M_inv=M_inv, tol=cg_tol,
                           maxiter=cg_maxiter)

    # value: ½ yᵀα + ½ logdet (SLQ) + (n/2) log 2π. The logdet is only
    # needed for reporting — gradient steps can skip it (compute_value=False)
    if compute_value:
        ld, _ = slq_logdet(Av, n, probes=probes,
                           lanczos_iters=lanczos_iters, key=key,
                           dtype=yv.dtype)
        nll = (0.5 * yv @ alpha + 0.5 * ld
               + 0.5 * n * math.log(2.0 * math.pi))
    else:
        nll = jnp.nan

    # probe solves shared across every θ: ONE block CG
    Z = jax.random.rademacher(
        jax.random.fold_in(key, 1), (n, probes)
    ).astype(yv.dtype)
    Wz, _ = cg_solve_block(Amm, Z, M_inv=M_inv, tol=probe_tol,
                           maxiter=probe_maxiter)

    g_gammas, g_kappas = [], []
    for (fam, nu, _), xa, g, k in zip(desc, xs_atoms, gammas, kappas):
        q_g = _atom_quad_gamma(xa, alpha, g, k, fam, nu)
        t_g = _atom_trace_gamma(xa, Wz, Z, g, k, fam, nu)
        g_gammas.append(q_g + 0.5 * t_g)
        # κ: ∂A/∂κ = K̃ (κ=1)
        Kz = gram_matmat(xa, xa, Z, family=fam, gamma=g, kappa=1.0, nu=nu)
        Ka = gram_matvec(xa, xa, alpha, family=fam, gamma=g, kappa=1.0,
                         nu=nu)
        g_kappas.append(
            -0.5 * (alpha @ Ka) + 0.5 * jnp.mean(jnp.sum(Wz * Kz, axis=0))
        )

    g_noise = (
        -0.5 * 2.0 * noise * (alpha @ alpha)
        + 0.5 * 2.0 * noise * jnp.mean(jnp.sum(Wz * Z, axis=0))
    )
    return nll, {"gammas": g_gammas, "kappas": g_kappas, "noise": g_noise}


def evidence_value_and_grad_sum(
    x, y, desc, gammas, kappas, noise, *,
    probes=16, lanczos_iters=30, cg_tol=1e-6, cg_maxiter=500, key=None,
    compute_value=True, probe_tol=None, probe_maxiter=100, precond_rank=0,
):
    """NLL and gradients for A = Σ_a κ_a K_a(γ_a) + σ²I over fused atoms.

    `desc` is a tuple of (family, nu, group|None) per atom; `gammas` a list
    of scalars or per-dim (ARD) vectors. Returns
    (nll, {"gammas": [...], "kappas": [...], "noise": g}).

    `precond_rank` > 0 builds a rank-r randomized-Nyström preconditioner
    (fresh landmarks per call, consistent with the CURRENT traced
    hyperparameters) for the alpha and probe CG solves — essential for
    ill-conditioned systems (small noise / long lengthscales) where plain
    CG stalls before `cg_maxiter`.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    yv = jnp.asarray(y).reshape(-1)
    probe_tol = cg_tol if probe_tol is None else probe_tol
    desc = tuple(
        (fam, float(nu), None if grp is None else tuple(grp))
        for (fam, nu, grp) in desc
    )
    core = _evg_core(desc, int(probes), int(lanczos_iters), float(cg_tol),
                     int(cg_maxiter), bool(compute_value), float(probe_tol),
                     int(probe_maxiter), int(precond_rank))
    gammas = tuple(jnp.asarray(g, yv.dtype) for g in gammas)
    kappas = tuple(jnp.asarray(k, yv.dtype) for k in kappas)
    return core(jnp.asarray(x), yv, gammas, kappas,
                jnp.asarray(noise, yv.dtype), key)


def evidence_value_and_grad_lazy(
    x, y, gamma, kappa=1.0, noise=0.1, *, family="se", nu=1.5,
    probes=16, lanczos_iters=30, cg_tol=1e-6, cg_maxiter=500, key=None,
    compute_value=True, probe_tol=None, probe_maxiter=100, precond_rank=0,
):
    """Single-atom wrapper around `evidence_value_and_grad_sum`: negative
    log evidence and its gradient w.r.t. (gamma, kappa, noise), using only
    lazy matvecs — O(n) memory. `gamma` may be a scalar or a per-dim (ARD)
    vector (the gradient is then per-dim).

    `probes` up to 128 cost the same on TPU (the block product pads the RHS
    lanes to 128) — prefer 64–128. `probe_tol` loosens the probe CG relative
    to the alpha solve: the trace term is stochastic anyway, so 1e-2 is
    usually enough and several times faster (default: cg_tol).
    `probe_maxiter` caps the probe CG independently (default 100 —
    GPyTorch-style early truncation; the resulting trace bias is far below
    hyperopt step noise).

    Returns (nll, grads) with grads = {"gamma", "kappa", "noise"}.
    """
    nll, g = evidence_value_and_grad_sum(
        x, y, ((family, nu, None),), [gamma], [kappa], noise,
        probes=probes, lanczos_iters=lanczos_iters, cg_tol=cg_tol,
        cg_maxiter=cg_maxiter, key=key, compute_value=compute_value,
        probe_tol=probe_tol, probe_maxiter=probe_maxiter,
        precond_rank=precond_rank,
    )
    return nll, {"gamma": g["gammas"][0], "kappa": g["kappas"][0],
                 "noise": g["noise"]}


# ---------------------------------------------------------------------------
# general-kernel evidence (chunked autodiff surrogate)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _evg_general_core(ko_id, chunk, probes, cg_tol, cg_maxiter,
                      probe_tol, probe_maxiter, compute_value,
                      lanczos_iters, precond_rank):
    kernel_object = _KO_REGISTRY[ko_id]

    @jax.jit
    def core(x, yv, params_dict, noise, key):
        from stpy_tpu.parallel.lazy_kernel import (
            make_chunked_matmat, make_chunked_matvec,
        )

        n = yv.shape[0]
        mv = make_chunked_matvec(kernel_object, x, chunk=chunk)
        mm = make_chunked_matmat(kernel_object, x, chunk=chunk)
        pd0 = jax.lax.stop_gradient(params_dict)
        s0 = jax.lax.stop_gradient(noise)

        def Av(v):
            return mv(v, pd0) + (s0 * s0) * v.reshape(-1)

        M_inv = None
        if precond_rank > 0:
            from stpy_tpu.parallel.iterative import rayleigh_nystrom_precond

            # landmark-sketch Rayleigh EVD (see rayleigh_nystrom_precond):
            # landmark columns for coverage, Rayleigh-compressed
            # eigenvalues for stability at any rank
            r = int(min(precond_rank, n))
            idx = jax.random.choice(jax.random.fold_in(key, 7), n, (r,),
                                    replace=False)
            C = kernel_object.eval_params(pd0, x, x[idx])   # (n, r)
            M_inv = rayleigh_nystrom_precond(
                C, lambda V: mm(V, pd0) + (s0 * s0) * V, s0)

        alpha, _, _ = cg_solve(Av, yv, M_inv=M_inv, tol=cg_tol,
                               maxiter=cg_maxiter)

        Z = jax.random.rademacher(
            jax.random.fold_in(key, 1), (n, probes)
        ).astype(yv.dtype)
        W, _ = cg_solve_block(
            lambda V: mm(V, pd0) + (s0 * s0) * V,
            Z, M_inv=M_inv, tol=probe_tol, maxiter=probe_maxiter,
        )

        def surrogate(pd, s):
            # ∇surrogate = −½αᵀ(∂A)α + ½·mean_p w_pᵀ(∂A)z_p  (α, W fixed)
            Ka = mv(alpha, pd)
            quad = -0.5 * (alpha @ Ka + (s * s) * (alpha @ alpha))
            KZ = mm(Z, pd)
            tr = 0.5 * (jnp.mean(jnp.sum(W * KZ, axis=0))
                        + (s * s) * jnp.mean(jnp.sum(W * Z, axis=0)))
            return quad + tr

        grads = jax.grad(surrogate, argnums=(0, 1))(params_dict, noise)
        if compute_value:
            ld, _ = slq_logdet(Av, n, probes=probes,
                               lanczos_iters=lanczos_iters, key=key,
                               dtype=yv.dtype)
            nll = (0.5 * yv @ alpha + 0.5 * ld
                   + 0.5 * n * math.log(2.0 * math.pi))
        else:
            nll = jnp.nan
        return nll, {"params": grads[0], "noise": grads[1]}

    return core


_KO_REGISTRY: dict = {}


def evidence_value_and_grad_general(
    kernel_object, x, y, params_dict=None, noise=0.1, *,
    chunk=2048, probes=16, lanczos_iters=30, cg_tol=1e-6, cg_maxiter=500,
    probe_tol=None, probe_maxiter=100, key=None, compute_value=True,
    precond_rank=0,
):
    """Matrix-free evidence gradient for ANY KernelFunction — products,
    additive groups, laplace, algebra — w.r.t. the FULL params pytree and
    the noise. ∂A terms come from autodiff through a row-chunked Gram
    (O(n·chunk) memory; each chunk checkpointed), the quadratic/trace
    identities are the same exact BBMM formulas as the fused tier.

    Returns (nll, {"params": grads-pytree, "noise": g}). Parity: matches
    the reference's dense any-kernel hyperopt (stpy/estimator.py:141-223)
    beyond dense-n scale.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    yv = jnp.asarray(y).reshape(-1)
    probe_tol = cg_tol if probe_tol is None else probe_tol
    pd = params_dict if params_dict is not None else kernel_object.params_dict
    pd = jax.tree.map(lambda a: jnp.asarray(a, yv.dtype), pd)
    ko_id = id(kernel_object)
    _KO_REGISTRY[ko_id] = kernel_object
    core = _evg_general_core(
        ko_id, int(min(chunk, yv.shape[0])), int(probes), float(cg_tol),
        int(cg_maxiter), float(probe_tol), int(probe_maxiter),
        bool(compute_value), int(lanczos_iters), int(precond_rank),
    )
    return core(jnp.asarray(x), yv, pd, jnp.asarray(noise, yv.dtype), key)


# ---------------------------------------------------------------------------
# full fit drivers (host-side Adam in log space)
# ---------------------------------------------------------------------------

def _adam_log_space(value_grad_fn, theta0, steps, lr, tol, verbose,
                    names=None):
    """Generic log-space Adam over a dict of positive numpy arrays.
    `value_grad_fn(theta) -> {name: grad-array}` (plain dθ, not dlogθ).
    Returns (theta, steps_run, history)."""
    import numpy as np

    theta = {k: np.asarray(v, np.float64) for k, v in theta0.items()}
    names = list(theta) if names is None else names
    m = {k: np.zeros_like(theta[k]) for k in names}
    v = {k: np.zeros_like(theta[k]) for k in names}
    b1, b2, eps = 0.9, 0.999, 1e-8
    ema = None
    history = []
    steps_run = 0
    for t in range(1, steps + 1):
        grads = value_grad_fn(theta)
        step_max = 0.0
        steps_run = t
        for k in names:
            g = np.asarray(grads[k], np.float64) * theta[k]  # chain to log
            m[k] = b1 * m[k] + (1 - b1) * g
            v[k] = b2 * v[k] + (1 - b2) * g * g
            mh = m[k] / (1 - b1**t)
            vh = v[k] / (1 - b2**t)
            dlog = lr * mh / (np.sqrt(vh) + eps)
            step_max = max(step_max, float(np.max(np.abs(dlog))))
            theta[k] = np.exp(np.log(theta[k]) - dlog)
        history.append(step_max)
        ema = step_max if ema is None else 0.7 * ema + 0.3 * step_max
        if verbose:
            print(f"step {t:3d}  max|dlog|={step_max:.3e}  "
                  + "  ".join(f"{k}={np.round(theta[k], 4)}" for k in names),
                  flush=True)
        if t >= 5 and ema < tol:
            break
    return theta, steps_run, history


def fit_evidence_lazy(
    x, y, gamma0, kappa0=1.0, noise0=0.1, *, family="se", nu=1.5,
    optimize=("gamma", "noise"), steps=30, lr=0.1, probes=64,
    cg_tol=1e-5, cg_maxiter=300, probe_tol=1e-2, probe_maxiter=60,
    tol=1e-2, final_value=True, key=None, verbose=False, precond_rank=0,
):
    """Full hyperparameter fit on the matrix-free evidence: Adam in
    log-space over any subset of (gamma, kappa, noise). `gamma0` may be a
    scalar or a per-dim (ARD) vector — vectors are optimized PER-DIM and
    returned as vectors.

    This is the large-n counterpart of `Estimator.optimize_params_general`
    (which autodiffs through a DENSE Cholesky and tops out at n ≈ 8k on one
    chip): each step is one `evidence_value_and_grad_lazy` call — O(n)
    memory, one compiled program reused across steps (hyperparameters are
    traced). Log-space makes the positivity constraint free and the step
    size scale-invariant (∂/∂log θ = θ·∂/∂θ).

    Stop rule: EMA of the largest per-step log-parameter movement under
    `tol` (default 1% — "the lengthscale stopped changing"). The raw
    gradient norm is NOT usable here: it scales with n and the Hutchinson
    probe noise sets an n-dependent floor, while Adam's normalized step
    automatically shrinks once the gradient is noise-dominated — so step
    size is the scale-free convergence signal.

    `final_value=False` skips the closing SLQ-logdet evaluation (the fit
    itself never needs NLL values, and at very large n the extra Lanczos
    pass is the single most expensive/fragile call); `nll` is then NaN.

    Returns a dict: fitted {gamma, kappa, noise} (floats; gamma an array
    when ARD), `nll`, `steps_run`, `history` (per-step max |Δlog θ|), and
    `nll_error` (None, or the repr of an exception raised by the closing
    SLQ evaluation — the fitted params are valid either way). Parity:
    replaces the reference's dense torchmin L-BFGS hyperfit
    (stpy/estimator.py:141-223) beyond dense-n scale.
    """
    import numpy as np

    key = key if key is not None else jax.random.PRNGKey(0)
    g0 = np.asarray(gamma0, np.float64)
    is_vec = g0.ndim > 0 and g0.size > 1
    theta0 = {"gamma": g0 if is_vec else float(g0),
              "kappa": float(kappa0), "noise": float(noise0)}
    names = [n_ for n_ in ("gamma", "kappa", "noise") if n_ in optimize]
    if not names:
        raise ValueError("optimize must name at least one of gamma/kappa/noise")

    step_counter = [0]

    def vg(theta):
        step_counter[0] += 1
        _, grads = evidence_value_and_grad_lazy(
            x, y,
            jnp.asarray(theta["gamma"]) if is_vec else float(theta["gamma"]),
            float(theta["kappa"]), float(theta["noise"]),
            family=family, nu=nu, probes=probes, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter,
            key=jax.random.fold_in(key, step_counter[0]),
            compute_value=False, probe_tol=probe_tol,
            probe_maxiter=probe_maxiter, precond_rank=precond_rank,
        )
        return {k: np.asarray(grads[k]) for k in names}

    theta, steps_run, history = _adam_log_space(
        vg, theta0, steps, lr, tol, verbose, names=names,
    )
    out = {
        "gamma": (np.asarray(theta["gamma"])
                  if is_vec else float(theta["gamma"])),
        "kappa": float(theta["kappa"]),
        "noise": float(theta["noise"]),
    }
    nll = float("nan")
    nll_error = None
    if final_value:
        try:
            val, _ = evidence_value_and_grad_lazy(
                x, y,
                jnp.asarray(out["gamma"]) if is_vec else out["gamma"],
                out["kappa"], out["noise"],
                family=family, nu=nu, probes=probes, cg_tol=cg_tol,
                cg_maxiter=cg_maxiter, key=jax.random.fold_in(key, 0),
                compute_value=True, probe_tol=probe_tol,
                probe_maxiter=probe_maxiter, precond_rank=precond_rank,
            )
            nll = float(val)
        except Exception as e:  # noqa: BLE001 — host-side driver; the
            # fitted params are valid even if the closing SLQ value errors
            # out. Surface the failure instead of swallowing it (r2 ADVICE).
            nll_error = repr(e)
            import warnings

            warnings.warn(
                f"fit_evidence_lazy: closing SLQ evidence evaluation "
                f"failed ({nll_error}); returning nll=nan", stacklevel=2,
            )
    return {**out, "nll": nll, "nll_error": nll_error,
            "steps_run": steps_run, "history": history}


def fit_evidence_sum(
    x, y, desc, gammas0, kappas0, noise0, *,
    optimize=("gamma", "noise"), steps=30, lr=0.1, probes=64,
    cg_tol=1e-5, cg_maxiter=300, probe_tol=1e-2, probe_maxiter=60,
    tol=1e-2, key=None, verbose=False, precond_rank=0,
):
    """Matrix-free hyperfit for a SUM of fused atoms (kernel algebra
    `k1 + k2`, each atom with its own γ_a scalar/vector and κ_a).

    Returns {"gammas": [...], "kappas": [...], "noise": float,
    "steps_run", "history"}.
    """
    import numpy as np

    key = key if key is not None else jax.random.PRNGKey(0)
    A = len(desc)
    theta0 = {"noise": float(noise0)}
    for a in range(A):
        g = np.asarray(gammas0[a], np.float64)
        theta0[f"gamma{a}"] = g if (g.ndim > 0 and g.size > 1) else float(g)
        theta0[f"kappa{a}"] = float(kappas0[a])
    names = []
    if "gamma" in optimize:
        names += [f"gamma{a}" for a in range(A)]
    if "kappa" in optimize:
        names += [f"kappa{a}" for a in range(A)]
    if "noise" in optimize:
        names += ["noise"]
    if not names:
        raise ValueError("optimize must name at least one of gamma/kappa/noise")

    step_counter = [0]

    def vg(theta):
        step_counter[0] += 1
        gs = [jnp.asarray(theta[f"gamma{a}"]) for a in range(A)]
        ks = [float(theta[f"kappa{a}"]) for a in range(A)]
        _, grads = evidence_value_and_grad_sum(
            x, y, desc, gs, ks, float(theta["noise"]),
            probes=probes, cg_tol=cg_tol, cg_maxiter=cg_maxiter,
            key=jax.random.fold_in(key, step_counter[0]),
            compute_value=False, probe_tol=probe_tol,
            probe_maxiter=probe_maxiter, precond_rank=precond_rank,
        )
        out = {"noise": np.asarray(grads["noise"])}
        for a in range(A):
            out[f"gamma{a}"] = np.asarray(grads["gammas"][a])
            out[f"kappa{a}"] = np.asarray(grads["kappas"][a])
        return out

    theta, steps_run, history = _adam_log_space(
        vg, theta0, steps, lr, tol, verbose, names=names,
    )
    return {
        "gammas": [theta[f"gamma{a}"] for a in range(A)],
        "kappas": [float(theta[f"kappa{a}"]) for a in range(A)],
        "noise": float(theta["noise"]),
        "steps_run": steps_run, "history": history,
    }


def fit_evidence_general(
    kernel_object, x, y, noise0=0.1, *,
    optimize=("gamma", "noise"), steps=30, lr=0.1, probes=32,
    chunk=2048, cg_tol=1e-5, cg_maxiter=300, probe_tol=1e-2,
    probe_maxiter=60, tol=1e-2, key=None, verbose=False, precond_rank=0,
):
    """Matrix-free hyperfit for ANY KernelFunction (products, groups,
    laplace, …): log-space Adam on `evidence_value_and_grad_general`
    over every positive lengthscale/amplitude leaf of the params pytree
    plus the noise.

    Optimized leaves: gamma-like keys when "gamma" ∈ optimize
    (gamma / ard_gamma / gamma_per_group / ard_per_group), kappa when
    "kappa" ∈ optimize, noise when "noise" ∈ optimize. Other params
    (cov, freq, offset, …) are held fixed. Writes nothing back — returns
    {"params": fitted-pytree, "noise": float, "steps_run", "history"}.
    """
    import numpy as np

    key = key if key is not None else jax.random.PRNGKey(0)
    _GAMMA_KEYS = {"gamma", "ard_gamma", "gamma_per_group", "ard_per_group"}
    pd0 = kernel_object.params_dict

    flat = {}  # name -> (atom_key, param_key)
    theta0 = {}
    for ak, sub in pd0.items():
        for pk, val in sub.items():
            if pk in _GAMMA_KEYS and "gamma" in optimize:
                pass
            elif pk == "kappa" and "kappa" in optimize:
                pass
            else:
                continue
            name = f"{ak}.{pk}"
            flat[name] = (ak, pk)
            v = np.asarray(val, np.float64)
            theta0[name] = v if (v.ndim > 0 and v.size > 1) else float(v)
    if "noise" in optimize:
        theta0["noise"] = float(noise0)
    if not theta0:
        raise ValueError("nothing to optimize for this kernel/optimize set")

    def theta_to_pd(theta):
        pd = {ak: dict(sub) for ak, sub in pd0.items()}
        for name, (ak, pk) in flat.items():
            ref = np.asarray(pd0[ak][pk])
            pd[ak][pk] = jnp.asarray(
                np.broadcast_to(np.asarray(theta[name]), ref.shape),
                jnp.asarray(pd0[ak][pk]).dtype,
            )
        return pd

    step_counter = [0]

    def vg(theta):
        step_counter[0] += 1
        s = float(theta.get("noise", noise0))
        _, grads = evidence_value_and_grad_general(
            kernel_object, x, y, theta_to_pd(theta), s,
            chunk=chunk, probes=probes, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, probe_tol=probe_tol,
            probe_maxiter=probe_maxiter,
            key=jax.random.fold_in(key, step_counter[0]),
            compute_value=False, precond_rank=precond_rank,
        )
        out = {}
        for name, (ak, pk) in flat.items():
            g = np.asarray(grads["params"][ak][pk], np.float64)
            t = np.asarray(theta[name])
            out[name] = g if t.shape == g.shape else np.sum(g)
        if "noise" in theta:
            out["noise"] = np.asarray(grads["noise"])
        return out

    theta, steps_run, history = _adam_log_space(
        vg, theta0, steps, lr, tol, verbose,
    )
    fitted = {ak: {} for ak in pd0}
    for name, (ak, pk) in flat.items():
        ref = jnp.asarray(pd0[ak][pk])
        fitted[ak][pk] = jnp.asarray(
            np.broadcast_to(np.asarray(theta[name]), ref.shape), ref.dtype
        )
    return {
        "params": fitted,
        "noise": float(theta.get("noise", noise0)),
        "steps_run": steps_run, "history": history,
    }
