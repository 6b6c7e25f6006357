"""Alias module mirroring the reference's `stpy/sampling/` package layout
(langevin.py, proximal_langevin.py, sampling_helper.py) — the
implementations live in `stpy_tpu.inference`."""

import jax
import jax.numpy as jnp

from stpy_tpu.inference.langevin import (  # noqa: F401
    LangevinSampler,
    MirrorLangevin,
    ProximalLangevin,
    mirror_langevin_box,
    projected_langevin,
    proximal_langevin,
    ula,
)


def euler_maruyama(key, drift, diffusion, x0, dt=1e-3, steps=1000):
    """Euler–Maruyama SDE integrator (parity:
    stpy/sampling/sampling_helper.py:5) as a lax.scan."""
    keys = jax.random.split(key, steps)

    def body(x, k):
        w = jax.random.normal(k, x.shape, x.dtype)
        x = x + drift(x) * dt + diffusion(x) * jnp.sqrt(dt) * w
        return x, x

    _, xs = jax.lax.scan(body, jnp.asarray(x0), keys)
    return xs
