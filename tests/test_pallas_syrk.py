"""Lower-syrk Pallas kernel + blocked Cholesky driver (ops/pallas_syrk.py),
interpret mode on CPU (the Mosaic path is exercised by TPU benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.ops.pallas_syrk import (
    chol_blocked_syrk,
    split_bf16,
    syrk_update_lower,
)


def test_split_bf16_reconstructs():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    hi, lo = split_bf16(w)
    back = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 2e-5  # two bf16 mantissas ≈ 16 bits


def test_syrk_update_lower_matches_dense():
    rng = np.random.default_rng(1)
    m, nb = 192, 128
    T = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((m, nb)), jnp.float32)
    out = np.asarray(syrk_update_lower(T, W, block=64, block_k=64,
                                       interpret=True), np.float64)
    ref = np.asarray(T, np.float64) - (
        np.asarray(W, np.float64) @ np.asarray(W, np.float64).T
    )
    il = np.tril_indices(m)
    rel = np.abs(out[il] - ref[il]).max() / np.abs(ref).max()
    assert rel < 5e-5  # bf16x3 (HIGH-equivalent) accuracy


def test_syrk_update_lower_pads_ragged_shapes():
    rng = np.random.default_rng(2)
    m, nb = 100, 70  # not multiples of the block sizes
    T = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((m, nb)), jnp.float32)
    out = np.asarray(syrk_update_lower(T, W, block=64, block_k=64,
                                       interpret=True), np.float64)
    ref = np.asarray(T, np.float64) - (
        np.asarray(W, np.float64) @ np.asarray(W, np.float64).T
    )
    il = np.tril_indices(m)
    assert np.abs(out[il] - ref[il]).max() / np.abs(ref).max() < 5e-5


@pytest.mark.parametrize("n", [256, 200])
def test_chol_blocked_syrk_matches_f64_reference(n):
    rng = np.random.default_rng(3)
    G = rng.standard_normal((n, 32)).astype(np.float32)
    K = jnp.asarray(G @ G.T + n * np.eye(n, dtype=np.float32))
    L = chol_blocked_syrk(K, nb=64, block=32, interpret=True)
    Lref = np.linalg.cholesky(np.asarray(K, np.float64))
    rel = np.abs(np.asarray(L, np.float64) - Lref).max() / np.abs(Lref).max()
    assert rel < 1e-5
    assert (np.triu(np.asarray(L), 1) == 0).all()


def test_chol_blocked_syrk_nan_propagates_for_indefinite():
    """safe_cholesky's jitter ladder detects failure via isfinite — the
    blocked factorization must produce NaNs for an indefinite input."""
    n = 128
    A = -jnp.eye(n, dtype=jnp.float32)
    L = chol_blocked_syrk(A, nb=64, block=32, interpret=True)
    assert not bool(jnp.all(jnp.isfinite(L)))
