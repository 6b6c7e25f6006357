"""SwissFEL accelerator-tuning simulator backed by a fitted GP.

Parity: stpy/test_functions/swissfel_simulator.py:8 (FelSimulator: load
measured data, fit a GP, use its posterior mean as the ground-truth
response). Data is passed in directly (the reference loads HDF5 files not
shipped here); checkpointing via numpy npz instead of pickle.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype


class FelSimulator:
    def __init__(self, d, sigma, name="fel"):
        self.d = d
        self.sigma = sigma
        self.name = name
        self.GP = None

    def load_fresh(self, x, y, dts="1"):
        """Provide measured data directly (replaces HDF5 loading)."""
        self.x = as_array(x).reshape(-1, self.d)
        self.y = as_array(y).reshape(-1, 1)

    def fit_simulator(self, GP, optimize="bandwidth", restarts=2):
        GP.fit_gp(self.x, self.y)
        if optimize is not None:
            GP.optimize_params(type=optimize, restarts=restarts)
        self.GP = GP
        return GP

    def eval_noiseless(self, X):
        assert self.GP is not None, "fit_simulator first"
        return self.GP.mean_std(as_array(X))[0]

    def eval(self, X, key=None):
        import jax

        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        mu = self.eval_noiseless(X)
        return mu + self.sigma * jax.random.normal(
            key, mu.shape, default_dtype()
        )

    def bounds(self, N=None, n=None):
        lo = jnp.min(self.x, axis=0)
        hi = jnp.max(self.x, axis=0)
        return jnp.stack([lo, hi], axis=1)

    opt_bounds = bounds

    def save(self, file_name):
        np.savez(
            file_name, x=np.asarray(self.x), y=np.asarray(self.y)
        )

    def load_pickle(self, file_name):
        dat = np.load(file_name)
        self.x = jnp.asarray(dat["x"], default_dtype())
        self.y = jnp.asarray(dat["y"], default_dtype())
