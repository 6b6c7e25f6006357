"""Frank-Wolfe and exponentiated-gradient steps on the simplex.

Parity: stpy/optim/frank_wolfe.py:6 (FW simplex step), :22 (EG step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frank_wolfe_step(grad, x, t):
    """FW over the simplex: move toward the best vertex with rate 2/(t+2)."""
    i = jnp.argmin(grad)
    vertex = jnp.zeros_like(x).at[i].set(1.0)
    gamma = 2.0 / (t + 2.0)
    return (1.0 - gamma) * x + gamma * vertex


def exponentiated_gradient_step(grad, x, eta):
    """Mirror-descent (entropic) step on the simplex."""
    logw = jnp.log(jnp.clip(x, 1e-30)) - eta * grad
    logw = logw - jnp.max(logw)
    w = jnp.exp(logw)
    return w / jnp.sum(w)


def minimize_on_simplex(fun, x0, steps=300, eta=0.1, method="eg"):
    """Minimize `fun` over the probability simplex (jit-safe scan)."""
    g = jax.grad(fun)

    def body(x, t):
        if method == "eg":
            x = exponentiated_gradient_step(g(x), x, eta)
        else:
            x = frank_wolfe_step(g(x), x, t.astype(x.dtype))
        return x, fun(x)

    x, vals = jax.lax.scan(body, jnp.asarray(x0), jnp.arange(steps))
    return x, vals[-1]
