"""Round-4 TPU batch — decompose and cut the hyperfit per-iteration cost
(VERDICT r3 task 4, continued).

exp_r4_hyperfit showed config 1 (n=1024, 8 restarts) at 2.52 s warm with
the whole vmapped L-BFGS fused into ONE while_loop program — the wall is
no longer dispatch, it is ~40 worst-lane iterations x (1 value+grad +
12-candidate batch) of BATCHED SMALL CHOLESKYS, which XLA:TPU runs far
below the MXU roofline. This batch times the pieces and the blocked
alternative (vmapped chol_recursive: leaves are (nb, nb) XLA chols,
everything else MXU GEMMs).

Run on the TPU host: timeout 3600 python benchmarks/exp_r4_hyperfit3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, LANES, CAND = 1024, 8, 96


def timed(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
        walls.append(time.perf_counter() - t0)
    return np.median(walls)


def main():
    from stpy_tpu.linalg import chol_recursive

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, 1)), jnp.float32)
    y = jnp.asarray(np.sin(4 * np.asarray(x))
                    + 0.05 * rng.standard_normal((N, 1)), jnp.float32)
    gammas8 = jnp.asarray(rng.uniform(0.3, 1.5, (LANES,)), jnp.float32)
    gammasC = jnp.asarray(rng.uniform(0.3, 1.5, (CAND,)), jnp.float32)
    s = 0.05

    def gram(g):
        sq = (x - x.T) ** 2
        return jnp.exp(-sq / (2 * g * g)) + (s * s) * jnp.eye(
            N, dtype=jnp.float32)

    def evidence(g, chol):
        K = gram(g)
        L = chol(K)
        al = jax.scipy.linalg.cho_solve((L, True), y)
        return (0.5 * (y.T @ al)[0, 0]
                + jnp.sum(jnp.log(jnp.diagonal(L))))

    chol_xla = jnp.linalg.cholesky
    chol_b128 = lambda K: chol_recursive(K, nb=128,
                                         precision=jax.lax.Precision.HIGHEST)
    chol_b256 = lambda K: chol_recursive(K, nb=256,
                                         precision=jax.lax.Precision.HIGHEST)

    gram_only = jax.jit(jax.vmap(gram))
    print(f"gram only        (8,{N}):  {timed(gram_only, gammas8)*1e3:7.1f} ms",
          flush=True)
    K8 = gram_only(gammas8)
    KC = jax.jit(jax.vmap(gram))(gammasC)

    for name, ch in [("xla", chol_xla), ("blk128", chol_b128),
                     ("blk256", chol_b256)]:
        f8 = jax.jit(jax.vmap(ch))
        fC = jax.jit(jax.vmap(ch))
        t8 = timed(f8, K8)
        tC = timed(fC, KC)
        print(f"chol {name:7s} (8,{N}): {t8*1e3:7.1f} ms   "
              f"({CAND},{N}): {tC*1e3:7.1f} ms", flush=True)
        # consistency
        d = float(jnp.max(jnp.abs(jnp.tril(f8(K8)[0])
                                  - jnp.tril(jax.vmap(chol_xla)(K8)[0]))))
        print(f"  max |L - L_xla| = {d:.2e}", flush=True)

    for name, ch in [("xla", chol_xla), ("blk256", chol_b256)]:
        val = jax.jit(jax.vmap(lambda g: evidence(g, ch)))
        vag = jax.jit(jax.vmap(jax.value_and_grad(
            lambda g: evidence(g, ch))))
        tv8 = timed(val, gammas8)
        tvC = timed(val, gammasC)
        tg8 = timed(vag, gammas8)
        print(f"evidence {name:7s} value(8): {tv8*1e3:7.1f} ms  "
              f"value({CAND}): {tvC*1e3:7.1f} ms  vag(8): {tg8*1e3:7.1f} ms",
              flush=True)

    print("R4_HYPERFIT3_DONE", flush=True)


if __name__ == "__main__":
    main()
