"""Permutation feature importance.

Parity: stpy/feature_importance/feature_ranker.py:7 (FeatureRanker:
importance via per-feature permutation / one-off removal score deltas).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array


class FeatureRanker:
    def __init__(self, model, x, y, metric=None, key=None):
        self.model = model
        self.x = as_array(x)
        self.y = as_array(y).reshape(-1, 1)
        self.metric = metric or (
            lambda yp, yt: float(jnp.mean((yp - yt) ** 2))
        )
        self.key = key if key is not None else jax.random.PRNGKey(0)

    def _score(self, x):
        mu = self.model.mean_std(x)[0]
        return self.metric(mu, self.y)

    def importance(self, repeats=5):
        """Permutation importance: score degradation when column j is
        shuffled."""
        base = self._score(self.x)
        n, d = self.x.shape
        out = np.zeros(d)
        for j in range(d):
            vals = []
            for r in range(repeats):
                self.key, sub = jax.random.split(self.key)
                perm = jax.random.permutation(sub, n)
                xp = self.x.at[:, j].set(self.x[perm, j])
                vals.append(self._score(xp))
            out[j] = np.mean(vals) - base
        return out

    def one_off_importance(self):
        """Score degradation when column j is zeroed (one-off removal)."""
        base = self._score(self.x)
        d = self.x.shape[1]
        out = np.zeros(d)
        for j in range(d):
            xz = self.x.at[:, j].set(jnp.mean(self.x[:, j]))
            out[j] = self._score(xz) - base
        return out
