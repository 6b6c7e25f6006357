"""Data transforms: affine box rescaling, Haar wavelets, Haar-Fisz variance
stabilization, and scores.

Parity: stpy/helpers/transformations.py:7 (transform), wavelets.py:9-21
(haar/haarval), haarfisz_transform.py:9-54, scores.py:3 (r_score_std).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array


def transform(X, low=-1.0, high=1.0, functions=True, offsets=None):
    """Affine map of columns of X onto [low, high]; returns (Xt, fwd, inv)
    when functions=True (parity: transformations.py:7)."""
    X = as_array(X)
    mins = jnp.min(X, axis=0)
    maxs = jnp.max(X, axis=0)
    if offsets is not None:
        mins = mins - as_array(offsets)
        maxs = maxs + as_array(offsets)
    span = jnp.where(maxs - mins < 1e-12, 1.0, maxs - mins)

    def fwd(Z):
        return low + (as_array(Z) - mins) / span * (high - low)

    def inv(Z):
        return mins + (as_array(Z) - low) / (high - low) * span

    if functions:
        return fwd(X), fwd, inv
    return fwd(X)


def haar_coefficients(f, interval, level):
    """Haar wavelet coefficients of f on the interval up to `level`
    (wavelets.py:9): returns (scaling_coef, detail_coefs[level][k])."""
    a, b = interval
    n = 2**level
    xs = np.linspace(a, b, n, endpoint=False) + (b - a) / (2 * n)
    vals = np.asarray(f(xs.reshape(-1, 1))).ravel()
    coefs = [vals.mean()]
    details = []
    cur = vals
    for l in range(level):
        evens, odds = cur[0::2], cur[1::2]
        details.append((evens - odds) / 2.0)
        cur = (evens + odds) / 2.0
    return coefs[0], details[::-1]


def haarval(scaling, details, x, interval):
    """Evaluate a Haar expansion at points x (wavelets.py:21)."""
    a, b = interval
    x = np.asarray(x).ravel()
    out = np.full_like(x, scaling, dtype=float)
    for l, det in enumerate(details):
        n = len(det)
        idx = np.clip(((x - a) / (b - a) * n).astype(int), 0, n - 1)
        frac = (x - a) / (b - a) * n - idx
        sign = np.where(frac < 0.5, 1.0, -1.0)
        out = out + sign * det[idx]
    return out


def haar_fisz_transform(data):
    """Variance-stabilizing Haar-Fisz transform of Poisson-ish counts
    (haarfisz_transform.py:9). Length must be a power of two."""
    v = np.asarray(data, dtype=float).copy()
    n = len(v)
    J = int(np.log2(n))
    assert 2**J == n, "length must be a power of 2"
    sm = [v]
    dt = []
    for _ in range(J):
        cur = sm[-1]
        s = (cur[0::2] + cur[1::2]) / 2.0
        d = (cur[0::2] - cur[1::2]) / 2.0
        f = np.where(s > 0, d / np.sqrt(s), 0.0)
        sm.append(s)
        dt.append(f)
    out = sm[-1]
    for f in reversed(dt):
        up = np.empty(2 * len(out))
        up[0::2] = out + f
        up[1::2] = out - f
        out = up
    return out


def inverse_haar_fisz_transform(data):
    """Inverse of the Haar-Fisz transform (haarfisz_transform.py:54)."""
    u = np.asarray(data, dtype=float).copy()
    n = len(u)
    J = int(np.log2(n))
    sm = [u]
    ft = []
    for _ in range(J):
        cur = sm[-1]
        s = (cur[0::2] + cur[1::2]) / 2.0
        f = (cur[0::2] - cur[1::2]) / 2.0
        sm.append(s)
        ft.append(f)
    out = sm[-1]
    for f in reversed(ft):
        d = f * np.sqrt(np.maximum(out, 0.0))
        up = np.empty(2 * len(out))
        up[0::2] = out + d
        up[1::2] = out - d
        out = up
    return out


def r_score_std(y_true, y_pred, std, alpha=1.0):
    """Uncertainty-weighted R² score (scores.py:3)."""
    y_true = as_array(y_true).ravel()
    y_pred = as_array(y_pred).ravel()
    std = as_array(std).ravel()
    w = 1.0 / (std**2 + alpha)
    ss_res = jnp.sum(w * (y_true - y_pred) ** 2)
    ss_tot = jnp.sum(w * (y_true - jnp.mean(y_true)) ** 2)
    return float(1.0 - ss_res / jnp.maximum(ss_tot, 1e-30))
