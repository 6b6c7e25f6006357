"""Test configuration: run on CPU with 8 virtual devices (multi-chip sharding
tests) and x64 enabled for tight-tolerance numeric checks. The same code runs
f32 on real TPU (bench.py).

Note: in this environment jax is pre-imported at interpreter startup with the
platform already selected, so env vars alone don't stick — we must update
jax.config directly (XLA_FLAGS is still read lazily at CPU backend init).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # Pin XLA:CPU codegen to AVX (no FMA3): LLVM contracts mul+add into FMA
    # at codegen — BELOW optimization_barrier, which a cse_barrier_expander
    # pass strips mid-pipeline — silently changing fl(a·b)+c to fma(a,b,c)
    # and corrupting every error-free transform (measured: composed df_mul
    # x² error 0 → 4.3e-7 abs with FMA codegen). TPU is unaffected (Mosaic
    # + XLA:TPU have no LLVM contraction); this pin makes CPU tests honor
    # the same EFT semantics the TPU production path has.
    _flags = (_flags + " --xla_cpu_max_isa=AVX").strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
