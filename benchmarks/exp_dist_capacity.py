"""Measure (not assert) the distributed dense path's per-device memory —
VERDICT r2 item 3.

Compile-only analysis on the 8-virtual-device CPU mesh: for each n, lower
DistributedExactGP's fit program (shard_map row-block Gram + recursive
sharded Cholesky + blocked trisolve) and read XLA's per-device
`memory_analysis()` — temp + argument + output bytes for ONE participant of
the SPMD program. The replicated baseline is the same computation on a
1-device mesh. Scaling target: per-device ≈ O(n²/p) vs O(n²).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/exp_dist_capacity.py
(forces CPU; safe alongside a TPU job)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # f32: match TPU arithmetic

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from stpy_tpu.kernels import KernelFunction  # noqa: E402
from stpy_tpu.parallel import DistributedExactGP  # noqa: E402


def _ma(compiled):
    ma = compiled.memory_analysis()
    alias = getattr(ma, "alias_size_in_bytes", 0)
    return {
        "temp": ma.temp_size_in_bytes,
        "args": ma.argument_size_in_bytes,
        "out": ma.output_size_in_bytes,
        # donated args alias their outputs — one buffer, count once
        "total": (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                  + ma.output_size_in_bytes - alias),
    }


def fit_memory_bytes(n, mesh, nb=1024, factorization="panels"):
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=2)
    gp = DistributedExactGP(k, s=0.1, mesh=mesh, nb=nb,
                            factorization=factorization)
    np_ = gp._padded_n(n)
    xs = jax.ShapeDtypeStruct((np_, 2), jnp.float32, sharding=gp._spec)
    ys = jax.ShapeDtypeStruct((n, 1), jnp.float32, sharding=gp._rep)
    if factorization == "panels":
        # host-stepped: the fit is build + k donated steps + solves, so the
        # per-device peak is the MAX stage, not one program's total
        build, step, k_panels, solve_y, fwd, nbe = gp._panel_stages(n, np_)
        spec = gp._spec
        strips_sds = tuple(
            jax.ShapeDtypeStruct((np_, nbe), jnp.float32, sharding=spec)
            for _ in range(k_panels)
        )
        stages = {
            "build": _ma(build.lower(xs).compile()),
            "step": _ma(step.lower(strips_sds, 0).compile()),
            "solve": _ma(solve_y.lower(strips_sds, ys).compile()),
        }
        worst = max(stages, key=lambda s: stages[s]["total"])
        out = dict(stages[worst])
        out["worst_stage"] = worst
        return out
    fit = gp._make_fit_fn(n, np_)
    return _ma(fit.lower(xs, ys).compile())


def main():
    devs = jax.devices()
    assert len(devs) >= 8, (
        "need 8 virtual devices: run with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    mesh8 = Mesh(np.array(devs[:8]), ("tp",))
    mesh1 = Mesh(np.array(devs[:1]), ("tp",))

    print(f"{'n':>6} {'fact':>8} {'temp/dev':>12} {'total/dev':>12} "
          f"{'repl total':>12} {'ratio':>6} {'n²/p':>8} {'x n²/p':>7} "
          f"{'worst stage':>12}")
    for n in (4096, 8192, 16384):
        m1 = fit_memory_bytes(n, mesh1, factorization="panels")
        for fact in ("panels", "rec"):
            m8 = fit_memory_bytes(n, mesh8, factorization=fact)
            ratio = m1["total"] / m8["total"]
            ideal = 4 * n * n / 8 / 2**20  # one f32 n²/p panel set, MB
            print(f"{n:>6} {fact:>8} {m8['temp']/2**20:>10.1f}MB "
                  f"{m8['total']/2**20:>10.1f}MB "
                  f"{m1['total']/2**20:>10.1f}MB {ratio:>6.2f} "
                  f"{ideal:>6.1f}MB "
                  f"{m8['total']/2**20/ideal:>7.2f} "
                  f"{m8.get('worst_stage', '-'):>12}")


if __name__ == "__main__":
    main()
