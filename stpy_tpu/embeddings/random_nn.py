"""Random neural-network feature maps.

Parity: stpy/embeddings/random_nn.py:6 (RandomMap), :125 (RandomOrthogonalMap
— stacked in the ref file), :169 (RandomNestedMap). torch nn.Modules become
plain parameter pytrees + optax Adam fits, all jitted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from stpy_tpu.config import as_array, default_dtype


class RandomMap:
    """One random hidden layer, trainable readout: Φ(x) = f(x W₁ᵀ) W₂."""

    def __init__(self, d, m, fun=jnp.tanh, output=2, seed=0):
        self.d, self.m, self.output = d, m, output
        self.fun = fun
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.W1 = jax.random.normal(k1, (m, d), default_dtype()) / np.sqrt(d)
        self.W2 = jax.random.normal(
            k2, (m, output), default_dtype()
        ) / np.sqrt(m)

    def hidden(self, x):
        return self.fun(as_array(x) @ self.W1.T)

    def map(self, x):
        return self.hidden(x) @ self.W2

    forward = map

    def embed(self, x):
        return self.hidden(x)

    def get_m(self):
        return self.m

    def get_params(self):
        return (self.W1, self.W2)

    def get_params_last(self):
        return self.W2

    def fit_map(self, x, y, epochs=1000, verbose=False, reg=0.1, lr=0.1,
                l1=0.0):
        """Fit the readout (and optionally hidden) by Adam on ridge(+L1)
        loss (random_nn.py:34-77)."""
        x = as_array(x)
        y = as_array(y).reshape(-1, self.output)
        H = self.hidden(x)

        def loss(W2):
            pred = H @ W2
            val = jnp.mean((pred - y) ** 2) + reg * jnp.sum(W2**2)
            if l1 > 0:
                val = val + l1 * jnp.sum(jnp.abs(W2))
            return val

        opt = optax.adam(lr)

        @jax.jit
        def train(W2):
            state = opt.init(W2)

            def body(carry, _):
                W2, state = carry
                g = jax.grad(loss)(W2)
                updates, state = opt.update(g, state)
                return (optax.apply_updates(W2, updates), state), None

            (W2, _), _ = jax.lax.scan(body, (W2, state), None, length=epochs)
            return W2

        self.W2 = train(self.W2)
        return self.W2

    def fit_map_lasso(self, x, y, epochs=1000, verbose=False, reg=0.1,
                      lr=0.1, l1=0.1):
        return self.fit_map(x, y, epochs=epochs, reg=reg, lr=lr, l1=l1)

    def fit_last_layer(self, x=None, y=None):
        """Closed-form ridge readout."""
        H = self.hidden(x)
        y = as_array(y).reshape(-1, self.output)
        A = H.T @ H + 0.1 * jnp.eye(self.m, dtype=H.dtype)
        self.W2 = jnp.linalg.solve(A, H.T @ y)
        return self.W2

    def loss(self, x, y):
        pred = self.map(x)
        return jnp.mean((pred - as_array(y).reshape(-1, self.output)) ** 2)


class RandomOrthogonalMap(RandomMap):
    """Hidden weights from a scaled orthogonal matrix (random_nn.py:125)."""

    def __init__(self, d, m, fun=jnp.tanh, output=2, seed=0):
        super().__init__(d, m, fun=fun, output=output, seed=seed)
        rng = np.random.default_rng(seed)
        G = rng.standard_normal((max(m, d), max(m, d)))
        Q, _ = np.linalg.qr(G)
        self.W1 = jnp.asarray(Q[:m, :d], default_dtype())


class RandomNestedMap(RandomMap):
    """Two stacked random layers (random_nn.py:169)."""

    def __init__(self, d, m, fun=jnp.tanh, output=1, seed=0):
        super().__init__(d, m, fun=fun, output=output, seed=seed)
        key = jax.random.PRNGKey(seed + 1)
        self.W_mid = jax.random.normal(
            key, (m, m), default_dtype()
        ) / np.sqrt(m)

    def hidden(self, x):
        h1 = self.fun(as_array(x) @ self.W1.T)
        return self.fun(h1 @ self.W_mid.T)
