"""Chunked-compensated GEMM ops (ops/compensated.py), CPU.

The TPU win (breaking the f32-accumulator floor of deep-contraction GEMMs)
is measured in benchmarks/exp_var2.py; here we verify correctness of the
(hi, lo) arithmetic against float64 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stpy_tpu.ops.compensated import df_gemm, dot_diag_df, gemm_compensated


def _f64(a):
    return np.asarray(a, np.float64)


def test_gemm_compensated_matches_f64():
    rng = np.random.default_rng(0)
    m, k, n = 96, 4096, 64
    A = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    ref = _f64(A) @ _f64(B)
    Ch, Cl = jax.jit(lambda a, b: gemm_compensated(a, b, chunk=512))(A, B)
    got = _f64(Ch) + _f64(Cl)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-7
    # the lo part is a genuine compensation term, orders below hi
    assert _f64(jnp.abs(Cl)).max() < 1e-3 * _f64(jnp.abs(Ch)).max()


def test_gemm_compensated_short_contraction_passthrough():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((32, 100)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((100, 16)), jnp.float32)
    Ch, Cl = gemm_compensated(A, B, chunk=512)
    assert float(jnp.abs(Cl).max()) == 0.0
    ref = _f64(A) @ _f64(B)
    assert np.abs(_f64(Ch) - ref).max() / np.abs(ref).max() < 2e-6


def test_gemm_compensated_ragged_padding():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.standard_normal((17, 1300)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((1300, 33)), jnp.float32)
    Ch, Cl = gemm_compensated(A, B, chunk=512)
    ref = _f64(A) @ _f64(B)
    assert np.abs(_f64(Ch) + _f64(Cl) - ref).max() / np.abs(ref).max() < 2e-6


def test_df_gemm_carries_lo_operand():
    rng = np.random.default_rng(3)
    m, k, n = 64, 2048, 48
    A64 = rng.standard_normal((m, k))
    Ah = jnp.asarray(A64, jnp.float32)
    Al = jnp.asarray(A64 - _f64(Ah), jnp.float32)
    B = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    ref = A64 @ _f64(B)
    Ch, Cl = jax.jit(df_gemm)(Ah, Al, B)
    got = _f64(Ch) + _f64(Cl)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-7
    # dropping the lo operand must be visibly worse than carrying it
    Ch0, Cl0 = jax.jit(df_gemm)(Ah, jnp.zeros_like(Al), B)
    got0 = _f64(Ch0) + _f64(Cl0)
    assert np.abs(got0 - ref).max() > np.abs(got - ref).max()


def test_dot_diag_df_cancellation():
    # columns engineered so 1 - ||v||² suffers catastrophic cancellation
    rng = np.random.default_rng(4)
    k, n = 8192, 32
    V64 = rng.standard_normal((k, n))
    V64 /= np.sqrt((V64**2).sum(0, keepdims=True))  # unit columns
    V64 *= np.sqrt(1.0 - 1e-4)                       # ||v||² = 1 - 1e-4
    Vh = jnp.asarray(V64, jnp.float32)
    Vl = jnp.asarray(V64 - _f64(Vh), jnp.float32)
    ref = 1.0 - np.einsum("kn,kn->n", _f64(Vh) + _f64(Vl), _f64(Vh) + _f64(Vl))
    sh, sl = jax.jit(dot_diag_df)(Vh, Vl, Vh, Vl)
    got = (1.0 - _f64(sh)) - _f64(sl)
    # df dot resolves the 1e-4-sized difference to ~1e-9 relative
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6
    # a plain f32 dot cannot (error comparable to the quantity itself)
    plain = 1.0 - _f64(jnp.sum(Vh * Vh, axis=0))
    assert np.abs(plain - ref).max() > 10 * np.abs(got - ref).max()


def test_gemv_df_exact_vs_f64():
    """The HLO df GEMV (TwoProd + pairwise TwoSum tree, no accumulator
    floor) reproduces the f64 GEMV of the full (hi + lo) matrix to
    double-float accuracy, eager and jitted (the barriers must survive the
    HLO simplifier)."""
    import jax

    from stpy_tpu.ops.compensated import gemv_df

    rng = np.random.default_rng(11)
    m, k = 200, 500
    A64 = np.exp(-((rng.uniform(-1, 1, (m, k))) ** 2)) * 2.0
    Ah = A64.astype(np.float32)
    Al = (A64 - Ah.astype(np.float64)).astype(np.float32)
    v = rng.standard_normal(k).astype(np.float32)
    want = A64 @ v.astype(np.float64)
    scale = np.max(np.abs(want))

    for fn in (gemv_df, jax.jit(gemv_df)):
        oh, ol = fn(jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(v))
        got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
        assert np.max(np.abs(got - want)) / scale < 1e-12
