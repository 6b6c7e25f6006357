"""Round-4 TPU batch — dense hyperfit wall anatomy + the batched
linesearch (VERDICT r3 task 4).

Config 1 (n=1024 exact-GP evidence hyperfit, 8 restarts) measured 1.72 s
warm in r3 — ~100x any compute floor. The anatomy: the optax backtracking
linesearch evaluates its halvings SEQUENTIALLY, so each L-BFGS iteration
is 1 value+grad plus up to 12 dependent Gram+Cholesky evaluations, and
under vmap every restart pays the deepest lane. At n ≤ a few k each
evaluation is latency-bound on TPU, so wall ≈ sequential depth × per-eval
latency. The r4 fix (opt/lbfgs.py `linesearch="batched"`, auto-selected
by the driver under a memory gate) evaluates all candidates in ONE
vmapped call: depth 2 per iteration.

Measures, for configs 1 and 5:
  * warm wall of the full `optimize_params` call (the run_all.py metric),
  * per-stage floors: one batched evidence value (8 or 64 lanes), one
    batched value+grad, one 12-candidate batched linesearch eval,
  * iteration counts and fitted gamma (must match r3: 0.516 / 0.584).

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_hyperfit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def force(v):
    for leaf in jax.tree_util.tree_leaves(v):
        if hasattr(leaf, "dtype"):
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def timed(fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_floors(gp, restarts, n_ls=12):
    """Per-stage latency floors of the hyperopt evaluation at this size."""
    from stpy_tpu.linalg import chol_jittered, cho_solve, logdet_from_chol

    kernel = gp.kernel_object
    x, y = gp.x, gp.y
    n = x.shape[0]
    s = jnp.asarray(gp.s, x.dtype)

    def evidence(gamma):
        K = kernel.eval_params({"0": {"gamma": gamma}}, x, x)
        K = 0.5 * (K + K.T) + jnp.eye(n, dtype=K.dtype) * (s * s)
        L = chol_jittered(K)
        alpha = cho_solve(L, y)
        return -(-0.5 * (y.T @ alpha)[0, 0] - 0.5 * logdet_from_chol(L))

    gs = jnp.linspace(0.3, 1.5, restarts)
    val = jax.jit(jax.vmap(evidence))
    vag = jax.jit(jax.vmap(jax.value_and_grad(evidence)))
    cand = jax.jit(jax.vmap(jax.vmap(evidence)))
    gs2 = jnp.tile(gs[:, None], (1, n_ls)) * jnp.linspace(
        0.9, 1.1, n_ls)[None, :]
    t_val = timed(lambda: val(gs))
    t_vag = timed(lambda: vag(gs))
    t_cand = timed(lambda: cand(gs2))
    print(f"  stage floors (n={n}, lanes={restarts}): value {t_val*1e3:.1f} ms"
          f" | value+grad {t_vag*1e3:.1f} ms"
          f" | {n_ls}-candidate batch {t_cand*1e3:.1f} ms", flush=True)


def run_config(tag, n, restarts, seed, sig, gen):
    from stpy_tpu.models import GaussianProcess

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 1))
    y = gen(x, rng)
    gp = GaussianProcess(gamma=1.0, s=sig, d=1)
    gp.fit_gp(x, y)

    def run():
        gp.optimize_params(type="bandwidth", restarts=restarts, maxiter=40)
        return gp.L

    wall = timed(run, reps=3)
    hm = gp.hyperopt_metrics
    gamma = float(gp.kernel_object.params_dict["0"]["gamma"])
    print(f"{tag}: warm wall {wall:.3f} s | fitted gamma {gamma:.4f} | "
          f"iters {np.asarray(hm['iterations']).tolist()} | "
          f"converged {int(np.asarray(hm['converged']).sum())}/{restarts}",
          flush=True)
    stage_floors(gp, restarts)
    return wall


def main():
    w1 = run_config(
        "config1 n=1024 r=8 ", 1024, 8, 0,
        0.05, lambda x, rng: np.sin(4 * x) + 0.05 * rng.standard_normal(
            (len(x), 1)))
    w5 = run_config(
        "config5 n=256  r=64", 256, 64, 4,
        0.05, lambda x, rng: np.log(2.5 * np.exp(-4 * x ** 2) + 0.3)
        + 0.05 * rng.standard_normal((len(x), 1)))
    print(f"SUMMARY config1 {w1:.3f} s (r3: 1.72; target <=0.5) | "
          f"config5 {w5:.3f} s (r3: 4.24; target <=2)", flush=True)
    print("R4_HYPERFIT_DONE", flush=True)


if __name__ == "__main__":
    main()
