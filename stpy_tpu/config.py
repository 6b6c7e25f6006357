"""Global configuration: dtype policy and jitter defaults.

The reference (stpy) is torch float64 on CPU everywhere. On TPU the MXU is
f32/bf16-native, so this rebuild computes in float32 by default with a jitter
policy for Cholesky stability, and switches to float64 automatically when JAX
x64 mode is enabled (used by the CPU test-suite for tight-rtol checks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 inputs (f32 accumulate), which costs ~3 digits
# on solves/posteriors (observed: 50x larger FF-vs-exact posterior error on
# TPU than CPU-f32). A GP library is accuracy-critical: force true-f32
# matmuls. The MXU runs f32xf32 via multi-pass bf16 (~3x slower per matmul);
# the Pallas Gram kernel keeps its own explicit preferred_element_type.
jax.config.update("jax_default_matmul_precision", "highest")

# Default relative jitter added to Gram diagonals before Cholesky, scaled by
# mean diagonal magnitude. f32 needs more than f64.
_JITTER_F32 = 1e-6
_JITTER_F64 = 1e-12


def default_dtype() -> jnp.dtype:
    """Float dtype used for newly created arrays."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_jitter(dtype=None) -> float:
    dtype = dtype or default_dtype()
    return _JITTER_F64 if jnp.dtype(dtype).itemsize >= 8 else _JITTER_F32


def as_array(x, dtype=None):
    """Convert array-like (incl. torch tensors / numpy) to a jnp array."""
    dtype = dtype or default_dtype()
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return jnp.asarray(x, dtype=dtype)
