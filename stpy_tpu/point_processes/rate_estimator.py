"""RateEstimator base: sensing-round data model for point processes.

Data = list of rounds (S, obs, dt): a sensed region S (BorelSet), observed
points obs ((k, d) array or None), and sensing duration dt.

Parity: stpy/point_processes/rate_estimator.py:5 — builds `counts` (n(A_i)),
`phis` (∫_{A_i} Φ · dt), embedded observations with duplicate merging
(:18-75), anchor-point assignment for the dual/compressed mode (:52-56),
incremental add_data_point (:77-131), rate evaluation helpers (:136-178).

TPU notes: per-round preprocessing is host-side (rounds arrive one at a
time); all inner tensor ops are jnp. Bucketization onto hierarchy leaves
uses the vectorized `is_inside` masks.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype


_JIT_PAD_MIN = 8


def _next_pow2(n: int, minimum: int = _JIT_PAD_MIN) -> int:
    size = minimum
    while size < n:
        size *= 2
    return size


class RateEstimator:
    # -- jit-stable shapes (SURVEY hard-part #3 for the sensing loop) ----------
    # Active sensing appends one round per step; naive torch.cat-style growth
    # (reference rate_estimator.py:77-131) would re-trace every jitted fit on
    # every round. With jit_pad on (default for count-record feedback), phis/
    # counts/observations/multiplicities are padded to the next power-of-2 row
    # count: padded rounds have zero phi rows and zero counts, padded
    # observations have zero embeddings with multiplicity 0, so every
    # likelihood/covariance consumer is unchanged — and a whole sensing
    # campaign costs O(log n) compilations instead of O(n).
    def _padding_active(self):
        return (
            bool(getattr(self, "jit_pad", False))
            and getattr(self, "feedback", None) in (
                "count-record", "histogram",
            )
            and not getattr(self, "dual", False)
        )

    def _trim_padding(self):
        ntr = getattr(self, "_n_rounds_true", None)
        if ntr is None:
            return
        self.phis = self.phis[:ntr]
        self.counts = self.counts[:ntr]
        if self.observations is not None and self._n_obs_true:
            self.observations = self.observations[: self._n_obs_true]
            self.obs_multiplicities = self.obs_multiplicities[
                : self._n_obs_true
            ]
        self._n_rounds_true = None

    def _apply_padding(self):
        if not self._padding_active() or getattr(self, "phis", None) is None:
            self._n_rounds_true = None
            return
        self._n_rounds_true = int(self.phis.shape[0])
        r = _next_pow2(self._n_rounds_true)
        self.phis = jnp.pad(
            self.phis, ((0, r - self._n_rounds_true), (0, 0))
        )
        self.counts = jnp.pad(self.counts, (0, r - self._n_rounds_true))
        if self.observations is not None:
            self._n_obs_true = int(self.observations.shape[0])
            o = _next_pow2(self._n_obs_true)
            self.observations = jnp.pad(
                self.observations, ((0, o - self._n_obs_true), (0, 0))
            )
            self.obs_multiplicities = jnp.pad(
                self.obs_multiplicities, (0, o - self._n_obs_true)
            )
        else:
            self._n_obs_true = 0

    @property
    def n_rounds(self):
        """Number of TRUE sensing rounds (self.phis may be padded)."""
        ntr = getattr(self, "_n_rounds_true", None)
        if ntr is not None:
            return ntr
        return int(self.phis.shape[0]) if getattr(self, "data", None) else 0

    def get_min_max(self):
        basic_sets = self.hierarchy.get_sets_level(self.hierarchy.levels)
        volumes = [s.volume() for s in basic_sets]
        return (np.min(volumes), np.max(volumes))

    def get_m(self):
        return self.packing.get_m()

    # -- data loading ----------------------------------------------------------
    def _merge_duplicates(self, obs):
        """Unique rows weighted by multiplicity (parity: the reference
        multiplies the embedding of a duplicated point by its count,
        rate_estimator.py:36-40). Returns (unique_obs, multiplicities)."""
        obs_np = np.asarray(obs)
        uniq, counts = np.unique(obs_np, axis=0, return_counts=True)
        return (
            jnp.asarray(uniq, default_dtype()),
            jnp.asarray(counts, default_dtype()),
        )

    def load_data(self, data, times=True):
        self.approx_fit = False
        if len(data) == 0:
            return
        phis, observations, counts, x = [], [], [], []
        obs_weights = []
        self.data = list(data)
        for S, obs, dt in data:
            count = 0.0
            if obs is not None:
                obs = as_array(obs).reshape(-1, self.d)
                x.append(obs)
                uniq, mult = self._merge_duplicates(obs)
                emb = self.packing.embed(uniq) * (dt if times else 1.0)
                # store multiplicities separately: the likelihood weighs
                # log-terms by counts (the reference scales coordinates
                # instead — undercounts duplicates; see module docstring)
                observations.append(emb)
                obs_weights.append(mult)
                count = float(emb.shape[0])
                if getattr(self, "dual", False):
                    self.global_dt = dt
                    d2 = jnp.sum(
                        (uniq[:, None, :] - self.anchor_points[None, :, :]) ** 2,
                        axis=-1,
                    )
                    idx = np.asarray(jnp.argmin(d2, axis=1))
                    mult_np = np.asarray(mult)
                    w = np.asarray(self.anchor_weights)
                    np.add.at(w, idx, mult_np)
                    self.anchor_weights = jnp.asarray(w, default_dtype())
            phi = self.packing.integral(S) * dt
            phis.append(phi.reshape(1, -1))
            counts.append(count)

        self.counts = jnp.asarray(counts, default_dtype())
        self.phis = jnp.concatenate(phis, axis=0)
        self.x = jnp.concatenate(x, axis=0) if x else None
        self.observations = (
            jnp.concatenate(observations, axis=0) if observations else None
        )
        self.obs_multiplicities = (
            jnp.concatenate(obs_weights) if obs_weights else None
        )
        if self.feedback == "count-record":
            self.bucketization()
        self._apply_padding()

    def add_data_point(self, new_data, times=True):
        self.approx_fit = False
        if self.data is None:
            self.load_data([new_data])
            return
        self._trim_padding()
        self.data.append(new_data)
        S, obs, dt = new_data
        if obs is not None:
            obs = as_array(obs).reshape(-1, self.d)
            uniq, mult = self._merge_duplicates(obs)
            emb = self.packing.embed(uniq) * (dt if times else 1.0)
            count = float(emb.shape[0])
            self.observations = (
                jnp.concatenate([self.observations, emb], axis=0)
                if self.observations is not None else emb
            )
            self.obs_multiplicities = (
                jnp.concatenate([self.obs_multiplicities, mult])
                if self.obs_multiplicities is not None else mult
            )
            if getattr(self, "dual", False):
                d2 = jnp.sum(
                    (uniq[:, None, :] - self.anchor_points[None, :, :]) ** 2,
                    axis=-1,
                )
                idx = np.asarray(jnp.argmin(d2, axis=1))
                w = np.asarray(self.anchor_weights)
                np.add.at(w, idx, np.asarray(mult))
                self.anchor_weights = jnp.asarray(w, default_dtype())
        else:
            count = 0.0
        phi = self.packing.integral(S).reshape(1, -1) * dt
        self.phis = jnp.concatenate([self.phis, phi], axis=0)
        self.counts = jnp.concatenate(
            [self.counts, jnp.asarray([count], default_dtype())]
        )
        if self.feedback == "count-record":
            # incremental bucket update (parity: rate_estimator.py:118-131)
            for index, elementary in enumerate(self.basic_sets):
                if S.inside(elementary):
                    if obs is not None:
                        mask = elementary.is_inside(obs)
                        self.total_bucketized_obs = (
                            self.total_bucketized_obs.at[index].add(
                                float(jnp.sum(mask))
                            )
                        )
                    self.bucketized_counts = self.bucketized_counts.at[
                        index
                    ].add(1)
                    self.total_bucketized_time = (
                        self.total_bucketized_time.at[index].add(dt)
                    )
        self._apply_padding()

    # -- rate evaluation (parity: rate_estimator.py:136-178) -------------------
    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return self.mean_rate_points(xtest)

    def mean_rate_points(self, xtest):
        if self.rate is not None:
            return self.packing.embed(xtest) @ self.rate.reshape(-1, 1)
        return (
            self.packing.embed(xtest)[:, :1] * 0 + self.b
        )

    def mean_set(self, S, dt=1):
        phi = self.packing.integral(S) * dt
        return phi @ self.rate.reshape(-1, 1)

    def rate_value(self, x, dt=1):
        phi = self.packing.embed(x) * dt
        if self.rate is not None:
            return phi @ self.rate.reshape(-1, 1)
        print("Rate function not fitted!")
        return 0 * phi[:, :1] + self.b

    def sample_value(self, S):
        return self.packing.integral(S) @ self.sampled_theta

    def sample_path(self, S, n=128):
        xtest = S.return_discretization(n)
        self._require_sampled()
        return self.packing.embed(xtest) @ self.sampled_theta

    def sample_path_points(self, xtest):
        self._require_sampled()
        return self.packing.embed(xtest) @ self.sampled_theta.reshape(-1, 1)

    def _require_sampled(self):
        if getattr(self, "sampled_theta", None) is None:
            raise RuntimeError(
                "no posterior sample available — call .sample() first"
            )

    def get_observations(self):
        if self.data is None:
            return None
        points = [as_array(d[1]) for d in self.data if d[1] is not None]
        return jnp.vstack(points) if points else None
