"""On-device L-BFGS driver (replaces pytorch-minimize / torchmin L-BFGS,
stpy/estimator.py:187, and the scipy L-BFGS-B calls).

Built on `optax.lbfgs` (zoom linesearch) inside a bounded `lax.while_loop`,
so the whole optimization — including hyperparameter restarts vmapped over
batch axes — is one XLA computation. Box constraints are handled by smooth
reparameterization (log for positive scalars, scaled-tanh for finite boxes):
simpler and better-conditioned on TPU than an active-set L-BFGS-B port.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    value: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def minimize_lbfgs(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iter: int = 200,
    tol: float = 1e-8,
    memory_size: int = 10,
    linesearch: str = "zoom",
    rtol: float = 0.0,
    xtol: float = 0.0,
    max_linesearch_steps: int = 30,
    step_clip: float | None = None,
) -> LBFGSResult:
    """Minimize `fun` (flat-vector -> scalar) starting from x0. jit/vmap-safe.

    linesearch='zoom' (strong-Wolfe; default) or 'backtracking' (sufficient
    decrease only — a much smaller XLA program, ~3x faster compiles for the
    vmapped-restart hyperopt; quality is usually equivalent with L-BFGS
    scaling).

    step_clip: if set, iterates are clipped to [-step_clip, step_clip]
    elementwise after every step. For sigmoid/tanh box reparameterizations
    this is the saturation guard: in f32, sigmoid(z) rounds to exactly 1.0
    past z≈17, the coordinate's gradient dies, and the solver dead-ends at
    a non-optimum (measured on the config-4 MAP cold fit,
    benchmarks/exp_r5_backtrack_debug.py). logit(1-1e-4)≈9.21 keeps every
    coordinate alive at a bound-resolution of 1e-4·span.

    Stopping: ||g|| <= tol (absolute) OR ||g|| <= rtol·(1+|f|) OR
    ||Δx||_∞ <= xtol·(1+||x||_∞). rtol/xtol default OFF (0.0) to preserve
    strict semantics for MAP fits; the evidence hyperopt turns them on —
    an absolute 1e-6 gradient norm is unreachable in f32 on an n-point
    evidence (gradient noise floor ~1e-3), so without them every restart
    silently burns all max_iter iterations."""
    if linesearch == "batched":
        return _minimize_lbfgs_batched_ls(
            fun, x0, max_iter=max_iter, tol=tol, memory_size=memory_size,
            rtol=rtol, xtol=xtol,
            max_linesearch_steps=max_linesearch_steps,
            step_clip=step_clip,
        )
    if linesearch == "backtracking":
        opt = optax.lbfgs(
            memory_size=memory_size,
            linesearch=optax.scale_by_backtracking_linesearch(
                max_backtracking_steps=max_linesearch_steps, store_grad=True
            ),
        )
    else:
        opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def _done(x, gnorm, val, dx):
        stop = gnorm <= tol
        if rtol > 0.0:
            stop = jnp.logical_or(stop, gnorm <= rtol * (1.0 + jnp.abs(val)))
        if xtol > 0.0:
            stop = jnp.logical_or(
                stop,
                dx <= xtol * (1.0 + jnp.max(jnp.abs(x))),
            )
        return stop

    def cond(carry):
        x, state, it, gnorm, val, dx = carry
        return jnp.logical_and(it < max_iter, ~_done(x, gnorm, val, dx))

    def body(carry):
        x, state, it, _, _, _ = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun
        )
        dx = jnp.max(jnp.abs(jax.tree.leaves(updates)[0]))
        x = optax.apply_updates(x, updates)
        if step_clip is not None:
            x = jnp.clip(x, -step_clip, step_clip)
        gnorm = jnp.linalg.norm(grad)
        return x, state, it + 1, gnorm, value, dx

    state0 = opt.init(x0)
    v0 = fun(x0)
    inf = jnp.asarray(jnp.inf, x0.dtype)
    carry = (x0, state0, jnp.asarray(0), inf, v0, inf)
    x, state, it, gnorm, _, dx = jax.lax.while_loop(cond, body, carry)
    # final value at returned point (not the pre-step value in the carry)
    vf = fun(x)
    return LBFGSResult(x=x, value=vf, iterations=it,
                       converged=_done(x, gnorm, vf, dx))


def _minimize_lbfgs_batched_ls(
    fun, x0, *, max_iter, tol, memory_size, rtol, xtol,
    max_linesearch_steps, step_clip=None,
):
    """L-BFGS with a BATCHED backtracking linesearch — the TPU dispatch-
    depth variant.

    optax's backtracking linesearch evaluates its halvings SEQUENTIALLY
    inside a while_loop: each hyperopt iteration costs 1 value+grad plus
    up to `max_linesearch_steps` dependent objective evaluations — and
    under vmapped restarts every lane pays the deepest lane's depth. On
    TPU each evaluation is a full Gram+Cholesky whose cost at hyperopt
    sizes (n ≤ a few k) is LATENCY, not FLOPs, so the sequential depth is
    the wall. Here all candidate steps η = 2^{-k} are evaluated in ONE
    vmapped call (a batched Gram/Cholesky the MXU eats for free at these
    sizes) and the largest Armijo-passing step wins: sequential depth 2
    per iteration instead of 1 + linesearch depth. Measured on the
    BASELINE configs (benchmarks/exp_r4_hyperfit.py): config 1
    1.72 → ~0.2 s, config 5 4.24 → ~0.6 s, identical fitted optima.

    Direction from `optax.scale_by_lbfgs` (returns +H⁻¹g; negated here —
    its memory uses actual param/grad diffs, so the η scaling below stays
    consistent). Armijo c1 = 1e-4, matching optax's backtracking default.

    Stall handling (r5): when NO candidate passes Armijo the old code took
    η = 2^-30 — a ~1e-9 step whose dx fired the xtol stop at a non-optimum
    (the config-4 MAP cold fit stalled at total 12.6 vs 5.0; a warm restart
    with FRESH memory from the same point kept descending, proving stale
    curvature pairs were the blocker — benchmarks/exp_r5_backtrack_debug.py).
    Now an Armijo failure takes the greedy-best candidate if it improves f,
    RESETS the L-BFGS memory (next direction = steepest descent), and does
    not count toward xtol; two consecutive no-improvement dead-ends stop
    the loop as converged-at-this-precision.
    """
    precond = optax.scale_by_lbfgs(memory_size=memory_size)
    etas = 0.5 ** jnp.arange(max_linesearch_steps, dtype=x0.dtype)
    c1 = 1e-4

    def _done(x, gnorm, val, dx):
        stop = gnorm <= tol
        if rtol > 0.0:
            stop = jnp.logical_or(stop, gnorm <= rtol * (1.0 + jnp.abs(val)))
        if xtol > 0.0:
            stop = jnp.logical_or(
                stop, dx <= xtol * (1.0 + jnp.max(jnp.abs(x))))
        return stop

    vag = jax.value_and_grad(fun)

    def cond(carry):
        x, state, it, gnorm, val, dx, fails = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, fails < 2),
            ~_done(x, gnorm, val, dx))

    def body(carry):
        x, state, it, _, _, _, fails = carry
        f, g = vag(x)
        d, state = precond.update(g, state, x)
        d = -d                                   # descent direction
        gd = jnp.vdot(g, d)
        # guard: if the two-loop direction lost descent (stale curvature
        # pairs), fall back to steepest descent for this step
        bad = gd >= 0.0
        d = jnp.where(bad, -g, d)
        gd = jnp.where(bad, -jnp.vdot(g, g), gd)
        cand = jax.vmap(lambda e: fun(x + e * d))(etas)
        ok = jnp.logical_and(
            cand <= f + c1 * etas * gd, jnp.isfinite(cand))
        any_ok = jnp.any(ok)
        # greedy rescue needs a decrease ABOVE the f32 rounding floor of f,
        # else near-convergence noise (|Δf| ~ eps·|f|) resets the dead-end
        # counter forever and refits burn all max_iter iterations
        eps_f = 8 * jnp.finfo(x.dtype).eps * (1.0 + jnp.abs(f))
        greedy_improves = jnp.logical_and(
            jnp.isfinite(cand).any(),
            jnp.nanmin(jnp.where(jnp.isfinite(cand), cand, jnp.inf))
            < f - eps_f)
        # argmax picks the FIRST True = the largest passing step
        eta_armijo = etas[jnp.argmax(ok)]
        eta_greedy = etas[jnp.argmin(
            jnp.where(jnp.isfinite(cand), cand, jnp.inf))]
        eta = jnp.where(any_ok, eta_armijo,
                        jnp.where(greedy_improves, eta_greedy,
                                  jnp.zeros((), x.dtype)))
        step = eta * d
        x_new = x + step
        if step_clip is not None:
            x_new = jnp.clip(x_new, -step_clip, step_clip)
        # Armijo failure → memory is stale: reinit so the next direction is
        # steepest descent, and exempt this step from the xtol stop
        fresh = precond.init(x_new)
        state = jax.tree.map(
            lambda s_new, s_old: jnp.where(any_ok, s_old, s_new),
            fresh, state)
        gnorm = jnp.linalg.norm(g)
        inf = jnp.asarray(jnp.inf, x.dtype)
        # dx = ACTUAL movement (post-clip): a step that only pushes already
        # clipped coordinates further out moves nothing and must count as
        # converged, not as progress
        dx = jnp.where(any_ok, jnp.max(jnp.abs(x_new - x)), inf)
        fails = jnp.where(jnp.logical_or(any_ok, greedy_improves),
                          0, fails + 1)
        return x_new, state, it + 1, gnorm, f, dx, fails

    state0 = precond.init(x0)
    v0 = fun(x0)
    inf = jnp.asarray(jnp.inf, x0.dtype)
    carry = (x0, state0, jnp.asarray(0), inf, v0, inf, jnp.asarray(0))
    x, state, it, gnorm, _, dx, fails = jax.lax.while_loop(cond, body, carry)
    vf = fun(x)
    return LBFGSResult(x=x, value=vf, iterations=it,
                       converged=jnp.logical_or(
                           _done(x, gnorm, vf, dx), fails >= 2))


def minimize_newton_small(
    fun, x0, *, max_iter=40, tol=1e-8, rtol=0.0, xtol=0.0,
    n_candidates=6,
):
    """Damped Newton for TINY dims (d ≤ ~3) — the hyperopt fast path.

    The vmapped L-BFGS spends ~40 worst-lane iterations x a 12-candidate
    linesearch batch on what is usually a 1-2 parameter evidence surface
    (bandwidth/noise); exact-Hessian Newton with a Levenberg floor and a
    small batched Armijo guard converges in ~5-12 iterations with 6
    value-only candidate evaluations each — measured ~4x less on-device
    work at identical optima (benchmarks/exp_r4_hyperfit.py). Same stop
    semantics as minimize_lbfgs (tol/rtol/xtol). jit/vmap-safe.
    """
    d = x0.shape[0]
    etas = jnp.asarray([1.0, 0.5, 0.25, 0.06, 0.01, 0.002][:n_candidates],
                       x0.dtype)
    c1 = 1e-4
    vag = jax.value_and_grad(fun)
    # reverse-over-reverse: forward-mode (jax.hessian) cannot cross the
    # Pallas gram's custom_vjp; at d <= 3 jacrev-of-grad is cheap anyway
    hess = jax.jacrev(jax.grad(fun))

    def _done(x, gnorm, val, dx):
        stop = gnorm <= tol
        if rtol > 0.0:
            stop = jnp.logical_or(stop, gnorm <= rtol * (1.0 + jnp.abs(val)))
        if xtol > 0.0:
            stop = jnp.logical_or(
                stop, dx <= xtol * (1.0 + jnp.max(jnp.abs(x))))
        return stop

    def cond(carry):
        x, it, gnorm, val, dx, stall = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, stall < 3),
            ~_done(x, gnorm, val, dx))

    def body(carry):
        x, it, _, f_prev, _, stall = carry
        f, g = vag(x)
        # stall-stop: a lane wandering a flat valley in sub-rtol steps
        # otherwise pins EVERY vmapped lane to max_iter (one config-5
        # restart burned 40/40 this way while the rest finished in ≤ 15)
        improved = (f_prev - f) > (rtol if rtol > 0 else 1e-12) * (
            1.0 + jnp.abs(f))
        stall = jnp.where(improved, 0, stall + 1)
        H = hess(x).reshape(d, d)
        # Levenberg floor: lift the spectrum to at least eps·scale so the
        # step stays a descent direction on indefinite regions
        scale = jnp.maximum(jnp.max(jnp.abs(H)), 1e-12)
        Hd = H + (1e-6 * scale) * jnp.eye(d, dtype=x.dtype)
        dstep = -jnp.linalg.solve(Hd, g)
        gd = jnp.vdot(g, dstep)
        bad = jnp.logical_or(~jnp.isfinite(gd), gd >= 0.0)
        # steepest-descent fallback scaled to the Newton step's size
        fb = -g * (jnp.linalg.norm(dstep)
                   / jnp.maximum(jnp.linalg.norm(g), 1e-30))
        dstep = jnp.where(bad, fb, dstep)
        gd = jnp.where(bad, jnp.vdot(g, dstep), gd)
        cand = jax.vmap(lambda e: fun(x + e * dstep))(etas)
        ok = jnp.logical_and(cand <= f + c1 * etas * gd, jnp.isfinite(cand))
        eta = jnp.where(jnp.any(ok), etas[jnp.argmax(ok)], 0.0)
        step = eta * dstep
        x_new = x + step
        return (x_new, it + 1, jnp.linalg.norm(g), f,
                jnp.max(jnp.abs(step)), stall)

    v0 = fun(x0)
    inf = jnp.asarray(jnp.inf, x0.dtype)
    carry = (x0, jnp.asarray(0), inf, v0, inf, jnp.asarray(0))
    x, it, gnorm, _, dx, _ = jax.lax.while_loop(cond, body, carry)
    vf = fun(x)
    return LBFGSResult(x=x, value=vf, iterations=it,
                       converged=_done(x, gnorm, vf, dx))


# -- smooth reparameterizations for constrained hyperparameters ---------------

def make_positive_bijector(scale: float = 1.0):
    """raw -> positive via exp; inverse log. (Lengthscales, noise, kappa.)"""
    fwd = lambda r: jnp.exp(r) * scale
    inv = lambda p: jnp.log(p / scale)
    return fwd, inv


def make_box_bijector(lo, hi):
    """raw -> (lo, hi) via scaled sigmoid; stable inverse."""
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def fwd(r):
        return lo + (hi - lo) * jax.nn.sigmoid(r)

    def inv(p):
        t = jnp.clip((p - lo) / (hi - lo), 1e-6, 1 - 1e-6)
        return jnp.log(t) - jnp.log1p(-t)

    return fwd, inv
