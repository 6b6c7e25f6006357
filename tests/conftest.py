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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
