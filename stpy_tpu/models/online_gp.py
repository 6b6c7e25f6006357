"""OnlineGP: jit-stable sequential GP for BO/active-learning loops.

SURVEY.md hard-part #3: the reference grows tensors with torch.cat per
added point (gauss_procc.py:97-105, kernelized_features.py:186-222), which
under jit would recompile at every step. Here all buffers are
CAPACITY-PADDED with a count mask, so `add_data_point`, `mean_std` and
`fit` are each ONE compiled XLA program for the whole loop:

  * the Cholesky factor lives in a (cap, cap) buffer that is
    block-diag(L_active, I) — padded rows/cols are identity;
  * adding a point appends one row to L in O(cap²) fixed-shape work
    (masked triangular solve + dynamic_update_slice), no refactorization;
  * predictions mask the inactive tail.

The incremental factor equals the batch Cholesky exactly (same recurrence),
so posteriors match `GaussianProcess` to roundoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.viz import RandomProcess


class OnlineGP(RandomProcess):
    def __init__(self, kernel_object, s=0.1, capacity=1024, d=1):
        self.kernel_object = kernel_object
        self.s = s
        self.capacity = int(capacity)
        self.d = int(d)
        dt = default_dtype()
        self.x_buf = jnp.zeros((self.capacity, self.d), dt)
        self.y_buf = jnp.zeros((self.capacity, 1), dt)
        self.L = jnp.eye(self.capacity, dtype=dt)
        self.alpha = jnp.zeros((self.capacity, 1), dt)
        self.count = 0
        self._build_jits()

    # -- jitted kernels (compiled once per capacity) ----------------------------
    def _build_jits(self):
        kernel = self.kernel_object
        cap = self.capacity
        s = self.s

        def add_point(x_buf, y_buf, L, count, x_new, y_new, params_dict):
            idx = count.astype(jnp.int32)
            zero = jnp.int32(0)
            x_buf = jax.lax.dynamic_update_slice(x_buf, x_new, (idx, zero))
            y_buf = jax.lax.dynamic_update_slice(y_buf, y_new, (idx, zero))
            mask = (jnp.arange(cap) < idx).astype(x_buf.dtype)
            # cross-kernel column against active points (masked)
            k_col = kernel.eval_params(params_dict, x_buf, x_new).reshape(-1)
            k_col = k_col * mask
            kss = kernel.diag(x_new, params_dict)[0] + s * s
            # w = L_active^{-1} k_active via the full padded factor
            # (padded block of L is identity, masked k is zero there)
            w = jax.scipy.linalg.solve_triangular(
                L, k_col.reshape(-1, 1), lower=True
            ).reshape(-1)
            w = w * mask
            diag = jnp.sqrt(jnp.maximum(kss - w @ w, 1e-12))
            # write the new row of L: [w, diag, 0...]; clear column idx first
            new_row = w.at[idx].set(diag)
            L = jax.lax.dynamic_update_slice(L, new_row[None, :], (idx, zero))
            # keep padded columns identity below: zero out entries right of
            # idx in the new row are already zero via mask
            count = count + 1
            # refresh alpha by two masked triangular solves (O(cap²))
            ymask = (jnp.arange(cap) < count).astype(y_buf.dtype)[:, None]
            z = jax.scipy.linalg.solve_triangular(
                L, y_buf * ymask, lower=True
            )
            alpha = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
            return x_buf, y_buf, L, alpha, count

        def predict(x_buf, L, alpha, count, xtest, params_dict):
            mask = (jnp.arange(cap) < count).astype(x_buf.dtype)
            K_star = kernel.eval_params(params_dict, xtest, x_buf) * mask
            mu = K_star @ alpha
            V = jax.scipy.linalg.solve_triangular(L, K_star.T, lower=True)
            V = V * mask[:, None]
            kss = kernel.diag(xtest, params_dict)
            var = jnp.maximum(kss - jnp.sum(V * V, axis=0), 1e-30)
            return mu, jnp.sqrt(var)[:, None]

        self._add_jit = jax.jit(add_point)
        self._predict_jit = jax.jit(predict)

    # -- public API --------------------------------------------------------------
    def add_data_point(self, x, y):
        x = as_array(x).reshape(1, self.d)
        y = as_array(y).reshape(1, 1)
        assert self.count < self.capacity, "capacity exhausted"
        (self.x_buf, self.y_buf, self.L, self.alpha,
         count) = self._add_jit(
            self.x_buf, self.y_buf, self.L,
            jnp.asarray(self.count, jnp.int32), x, y,
            self.kernel_object.params_dict,
        )
        self.count = int(count)

    def fit_gp(self, x, y):
        """Bulk load by repeated O(cap²) appends (still one compiled program
        per point; use GaussianProcess for large batch fits)."""
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        for i in range(x.shape[0]):
            self.add_data_point(x[i : i + 1], y[i : i + 1])

    def mean_std(self, xtest):
        xtest = as_array(xtest).reshape(-1, self.d)
        return self._predict_jit(
            self.x_buf, self.L, self.alpha,
            jnp.asarray(self.count, jnp.int32), xtest,
            self.kernel_object.params_dict,
        )

    def mean(self, xtest):
        return self.mean_std(xtest)[0]

    def ucb(self, xtest, beta=2.0):
        mu, std = self.mean_std(xtest)
        return mu + beta * std

    def lcb(self, xtest, beta=2.0):
        mu, std = self.mean_std(xtest)
        return mu - beta * std

    @property
    def x(self):
        return self.x_buf[: self.count]

    @property
    def y(self):
        return self.y_buf[: self.count]
