"""Conditional VAE (flax) — generative model used for candidate-set
generation.

Parity: stpy/generative_models/cvae.py:27 (torch.nn CVAE on MNIST-style
data: encode/reparameterize/decode, ELBO loss, train loop). Flax/linen +
optax rewrite; one jitted train step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


def one_hot(labels, class_size):
    return jax.nn.one_hot(jnp.asarray(labels), class_size)


class _Encoder(nn.Module):
    latent: int
    mid: int = 400

    @nn.compact
    def __call__(self, x, y):
        h = nn.relu(nn.Dense(self.mid)(jnp.concatenate([x, y], axis=-1)))
        mu = nn.Dense(self.latent)(h)
        logvar = nn.Dense(self.latent)(h)
        return mu, logvar


class _Decoder(nn.Module):
    out: int
    mid: int = 400

    @nn.compact
    def __call__(self, z, y):
        h = nn.relu(nn.Dense(self.mid)(jnp.concatenate([z, y], axis=-1)))
        return nn.sigmoid(nn.Dense(self.out)(h))


class CVAE:
    def __init__(self, feature_size, latent_size, output_size=None,
                 cond_size=10, midsize=400, seed=0):
        self.feature_size = feature_size
        self.latent_size = latent_size
        self.output_size = output_size or feature_size
        self.cond_size = cond_size
        self.enc = _Encoder(latent_size, midsize)
        self.dec = _Decoder(self.output_size, midsize)
        key = jax.random.PRNGKey(seed)
        k1, k2, self.key = jax.random.split(key, 3)
        dummy_x = jnp.zeros((1, feature_size))
        dummy_y = jnp.zeros((1, cond_size))
        dummy_z = jnp.zeros((1, latent_size))
        self.params = {
            "enc": self.enc.init(k1, dummy_x, dummy_y),
            "dec": self.dec.init(k2, dummy_z, dummy_y),
        }

    def encode(self, params, x, y):
        return self.enc.apply(params["enc"], x, y)

    def reparameterize(self, key, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(key, mu.shape)

    def decode(self, params, z, y):
        return self.dec.apply(params["dec"], z, y)

    def elbo_loss(self, params, key, x, y):
        mu, logvar = self.encode(params, x, y)
        z = self.reparameterize(key, mu, logvar)
        recon = self.decode(params, z, y)
        bce = -jnp.sum(
            x * jnp.log(jnp.clip(recon, 1e-8))
            + (1 - x) * jnp.log(jnp.clip(1 - recon, 1e-8))
        )
        kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
        return bce + kld

    def fit(self, X, Y, epochs=50, batch=128, lr=1e-3, verbose=False):
        X = jnp.asarray(X).reshape(-1, self.feature_size)
        Y = jnp.asarray(Y).reshape(-1, self.cond_size)
        opt = optax.adam(lr)
        state = opt.init(self.params)

        @jax.jit
        def step(params, state, key, xb, yb):
            loss, grads = jax.value_and_grad(self.elbo_loss)(
                params, key, xb, yb
            )
            updates, state = opt.update(grads, state)
            return optax.apply_updates(params, updates), state, loss

        n = X.shape[0]
        for ep in range(epochs):
            self.key, perm_key = jax.random.split(self.key)
            perm = jax.random.permutation(perm_key, n)
            tot = 0.0
            for i in range(0, n, batch):
                idx = perm[i : i + batch]
                self.key, sub = jax.random.split(self.key)
                self.params, state, loss = step(
                    self.params, state, sub, X[idx], Y[idx]
                )
                tot += float(loss)
            if verbose:
                print(f"epoch {ep}: loss {tot / n:.4f}")
        return self

    def sample(self, y, size=1, key=None):
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        y = jnp.asarray(y).reshape(-1, self.cond_size)
        y = jnp.tile(y, (size, 1)) if y.shape[0] == 1 else y
        z = jax.random.normal(key, (y.shape[0], self.latent_size))
        return self.decode(self.params, z, y)
