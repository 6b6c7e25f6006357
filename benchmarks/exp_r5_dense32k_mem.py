"""Compile-only memory accounting for the 32k fold_noise dense-double
fit: XLA memory_analysis of (a) the fit program alone and (b) the fused
fit_predict, at n=32,768 — pinpoints whether the runtime OOM is the fit
itself (scatter fold not aliasing, cholesky workspace) or the fused
program's combined output+temp live set. AOT compile only, no execution.

Run on the TPU host: timeout 3600 python benchmarks/exp_r5_dense32k_mem.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, T, S = 32768, 8, 2048, 0.1


def report(tag, lowered):
    c = lowered.compile()
    m = c.memory_analysis()
    gb = 1024 ** 3
    print(f"{tag}: temp {m.temp_size_in_bytes / gb:.2f} GB, "
          f"args {m.argument_size_in_bytes / gb:.2f} GB, "
          f"out {m.output_size_in_bytes / gb:.2f} GB, "
          f"alias {m.alias_size_in_bytes / gb:.2f} GB, "
          f"peak(temp+args+out-alias) "
          f"{(m.temp_size_in_bytes + m.argument_size_in_bytes + m.output_size_in_bytes - m.alias_size_in_bytes) / gb:.2f} GB",
          flush=True)


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.models import GaussianProcess

    gp = GaussianProcess(
        kernel=KernelFunction(kernel_name="squared_exponential", gamma=0.5,
                              d=D),
        s=S, precision="double", var_refine=1, jitter_ladder=False,
        fold_noise=True,
    )
    gp._build_jits()
    x = jax.ShapeDtypeStruct((N, D), jnp.float32)
    y = jax.ShapeDtypeStruct((N, 1), jnp.float32)
    xt = jax.ShapeDtypeStruct((T, D), jnp.float32)
    s = jax.ShapeDtypeStruct((), jnp.float32)
    pd = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(jnp.shape(v), jnp.result_type(v)),
        gp._pd())
    report("fit only      ", gp._fit_fn.lower(x, y, pd, s))
    report("fused fit_pred", gp._fit_predict_fn.lower(x, y, pd, s, xt))
    print("R5_DENSE32K_MEM_DONE", flush=True)


if __name__ == "__main__":
    main()
