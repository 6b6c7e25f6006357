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
) -> LBFGSResult:
    """Minimize `fun` (flat-vector -> scalar) starting from x0. jit/vmap-safe.

    linesearch='zoom' (strong-Wolfe; default) or 'backtracking' (sufficient
    decrease only — a much smaller XLA program, ~3x faster compiles for the
    vmapped-restart hyperopt; quality is usually equivalent with L-BFGS
    scaling)."""
    if linesearch == "backtracking":
        opt = optax.lbfgs(
            memory_size=memory_size,
            linesearch=optax.scale_by_backtracking_linesearch(
                max_backtracking_steps=30, store_grad=True
            ),
        )
    else:
        opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        x, state, it, gnorm, val = carry
        return jnp.logical_and(it < max_iter, gnorm > tol)

    def body(carry):
        x, state, it, _, _ = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun
        )
        x = optax.apply_updates(x, updates)
        gnorm = jnp.linalg.norm(grad)
        return x, state, it + 1, gnorm, value

    state0 = opt.init(x0)
    v0 = fun(x0)
    carry = (x0, state0, jnp.asarray(0), jnp.asarray(jnp.inf, x0.dtype), v0)
    x, state, it, gnorm, _ = jax.lax.while_loop(cond, body, carry)
    # final value at returned point (not the pre-step value in the carry)
    vf = fun(x)
    return LBFGSResult(x=x, value=vf, iterations=it, converged=gnorm <= tol)


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
