"""Round-4 TPU batch — close the refined-variance bar with the split8
main product (VERDICT r3 task 1).

exp_r4_qform_stage showed the qform floor is the HIGHEST main product's
per-product truncation (bf16x6 drops the 2⁻²⁴ a1·b2 + a2·b1 cross terms;
error FLAT in block_k), plus a second-order identity bias (c) set by the
W0 solve precision. The split8 kernel mode computes all terms through
2⁻²⁴ as explicit bf16 MXU passes with the gross-magnitude a0·b0 pass
sub-chunked at 128 and TwoSum-folded; HIGHEST W0 solves shrink (c)
quadratically.

Grid: {HIGHEST, split8} x {W0 HIGH, HIGHEST}, full-t pipeline accuracy
vs the cached f64 references for se / matern32 / se+matern52, plus warm
fused fit+predict walls. Done-bar: var max ≤ 1e-6 for all three at
≤ 1.0 s fused.

Run on the TPU host: timeout 7200 python benchmarks/exp_r4_qform_fix.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from exp_r3_batch_c import host_reference, matern64, sq64

N, D, S = 16384, 8, 0.1


def family(name):
    from stpy_tpu.kernels import KernelFunction

    if name == "se":
        return (lambda: KernelFunction(kernel_name="squared_exponential",
                                       gamma=0.5, d=D),
                lambda a, b: np.exp(-sq64(a, b) / (2 * 0.25)))
    if name == "matern32":
        return (lambda: KernelFunction(kernel_name="matern", gamma=0.8,
                                       nu=1.5, d=D),
                lambda a, b: matern64(sq64(a, b), 0.8, 1.5))
    if name == "se+matern":
        # gamma=1.1 matches the cached .ref_c1_se+matern_16384 reference
        # (exp_r3_batch_c.py:112) — an f32-inexact gamma, deliberately
        return (lambda: (KernelFunction(kernel_name="squared_exponential",
                                        gamma=0.5, d=D)
                         + KernelFunction(kernel_name="matern", gamma=1.1,
                                          nu=2.5, d=D)),
                lambda a, b: (np.exp(-sq64(a, b) / (2 * 0.25))
                              + matern64(sq64(a, b), 1.1, 2.5)))
    raise ValueError(name)


def run(name, qform, w0prec, reps=3):
    from stpy_tpu.models import GaussianProcess

    mk, k64 = family(name)
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    yh = np.sin(3 * xh[:, :1])
    xt = rng.uniform(-1, 1, (N, D)).astype(np.float32).astype(np.float64)
    x, y, xtj = (jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(xt, jnp.float32))
    mu64, var64 = host_reference(k64, xh, yh, xt, S, cache=f"c1_{name}_{N}")

    gp = GaussianProcess(kernel=mk(), s=S, precision="double", var_refine=1,
                         qform_precision=qform, var_precision=w0prec)
    gp.fit_gp(x, y)
    mu, sd = gp.mean_std(xtj)
    float(jnp.sum(sd))  # force through the tunnel
    vrel = np.abs(np.asarray(sd, np.float64).ravel() ** 2 - var64) / var64
    mrel = np.abs(np.asarray(mu, np.float64).ravel() - mu64)
    mrel = mrel.max() / np.abs(mu64).max()

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mu2, sd2 = gp.fit_predict(x, y, xtj)
        float(jnp.sum(sd2))
        walls.append(time.perf_counter() - t0)
    qn = (qform if isinstance(qform, str)
          else ("default" if qform is None else "HIGHEST"))
    wn = {jax.lax.Precision.HIGH: "HIGH",
          jax.lax.Precision.HIGHEST: "HIGHEST",
          None: "default"}[w0prec]
    print(f"{name:10s} qform={qn:8s} W0={wn:8s} "
          f"mean rel {mrel:.2e}  var max {vrel.max():.2e} "
          f"med {np.median(vrel):.2e}  fused wall {np.median(walls):.3f}s "
          f"(min {min(walls):.3f})", flush=True)
    del gp


def main():
    import sys as _sys

    H = jax.lax.Precision.HIGH
    HH = jax.lax.Precision.HIGHEST
    if "defaults" in _sys.argv:
        # SHIPPED defaults (r4): qform=ozaki, W0 = HIGH for single atoms /
        # HIGHEST for composites (exact_gp.predict_refined) — the final
        # RESULTS accuracy/wall rows
        run("se", None, None)
        run("matern32", None, None)
        run("se+matern", None, None)
        print("R4_QFORM_FIX_DONE", flush=True)
        return
    if "ozaki" in _sys.argv:
        # the winning scheme (exp_r4_ozaki: (4,4) slices, p+q <= 3 —
        # q-err 3.8e-7 max) across all three families
        run("se", "ozaki", H)
        run("matern32", "ozaki", H)
        run("se+matern", "ozaki", H)
        print("R4_QFORM_FIX_DONE", flush=True)
        return
    # se first across the grid; then the winner config on the other two
    run("se", HH, H)            # baseline (r3 shipped config)
    run("se", "split8", H)
    run("se", "split8", HH)
    run("matern32", "split8", HH)
    run("se+matern", "split8", HH)
    print("R4_QFORM_FIX_DONE", flush=True)


if __name__ == "__main__":
    main()
