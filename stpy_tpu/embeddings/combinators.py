"""Embedding combinators: concat, masked, additive-per-group, projective,
weighted. Parity: stpy/embeddings/embedding.py:705-784 and
weighted_embedding.py:6."""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.embeddings.base import Embedding


class ConcatEmbedding(Embedding):
    """Stack embeddings side by side (embedding.py:705)."""

    def __init__(self, embeddings: List[Embedding]):
        self.embeddings = embeddings
        self.m = sum(int(e.get_m()) for e in embeddings)
        self.d = embeddings[0].d

    def embed(self, x):
        return jnp.concatenate([e.embed(x) for e in self.embeddings], axis=1)

    def get_m(self):
        return self.m

    def integral(self, S):
        return jnp.concatenate([e.integral(S) for e in self.embeddings])


class MaskedEmbedding(Embedding):
    """Row-wise mask applied to another embedding (embedding.py:716)."""

    def __init__(self, embedding: Embedding, mask: Callable):
        self.embedding = embedding
        self.m = embedding.get_m()
        self.d = embedding.d
        self.mask = mask

    def embed(self, x):
        x = as_array(x)
        return self.mask(x).reshape(-1, 1) * self.embedding.embed(x)

    def get_m(self):
        return self.m


class AdditiveEmbeddings(Embedding):
    """Per-group block embeddings: Φ(x) = [s_1 Φ_1(x_{G_1}), ...]
    (embedding.py:727); the feature-space form of additive kernels."""

    def __init__(self, embeddings, ms=None, groups=None, scaling=None,
                 additive=True):
        self.embeddings = list(embeddings)
        self.no_emb = len(self.embeddings)
        self.groups = (
            groups if groups is not None else [[i] for i in range(self.no_emb)]
        )
        self.ms = (
            [int(m) for m in ms]
            if ms is not None
            else [int(e.get_m()) for e in self.embeddings]
        )
        self.scaling = (
            as_array(scaling)
            if scaling is not None
            else jnp.ones(self.no_emb, default_dtype())
        )
        self.additive = additive
        self.m = int(sum(self.ms))

    def embed(self, x):
        x = as_array(x)
        blocks = []
        for i, emb in enumerate(self.embeddings):
            idx = jnp.asarray(self.groups[i])
            blocks.append(
                emb.embed(x[:, idx].reshape(-1, len(self.groups[i])))
                * self.scaling[i]
            )
        return jnp.concatenate(blocks, axis=1)

    def get_m(self):
        return self.m


class ProjectiveEmbeddings(Embedding):
    """Embed after a projection map (embedding.py:763)."""

    def __init__(self, embedding: Embedding, project: Callable):
        self.embedding = embedding
        self.project = project
        self.m = embedding.get_m()

    def embed(self, x):
        return self.embedding.embed(self.project(as_array(x)))

    def get_m(self):
        return self.m


class WeightedEmbedding(Embedding):
    """Per-feature weights w ⊙ Φ(x) (weighted_embedding.py:6)."""

    def __init__(self, embedding: Embedding, weights=None):
        self.embedding = embedding
        self.m = embedding.get_m()
        self.d = embedding.d
        self.weights = (
            as_array(weights)
            if weights is not None
            else jnp.ones(self.m, default_dtype())
        )

    def embed(self, x):
        return self.embedding.embed(x) * self.weights[None, :]

    def get_m(self):
        return self.m

    def integral(self, S):
        return self.embedding.integral(S) * self.weights
