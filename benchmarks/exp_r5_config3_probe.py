"""r5 VERDICT task 1: root-cause config 3's bimodal warm wall.

r4 measured median 2.75 s / IQR 1.27 s / min 1.43 s on the Nystrom ridge
n=50k config (run_all.py:config3), rep-to-rep inside ONE process. Suspects
(VERDICT): landmark-choice recompute, buffer re-layout, per-rep retransfer
of the 50k dataset, or eager per-op dispatch variance through the tunnel.

This probe (a) reproduces the monolithic wall over 9 reps, then (b) times
every stage of the SAME eager pipeline per rep with forced readbacks, so
the bimodality lands on a named stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.embeddings import NystromFeatures
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import safe_cholesky, cho_solve


def force(*outs):
    for out in outs:
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
                float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def main():
    rng = np.random.default_rng(2)
    n = 50_000
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    y = (np.sin(3 * x[:, :1]) + x[:, 1:]).astype(np.float32)
    k = (
        KernelFunction(kernel_name="matern", gamma=0.4, nu=1.5, d=2, group=[0])
        + KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=2,
                         group=[1])
    )
    nf = NystromFeatures(k, m=512, approx="uniform", s=0.05)

    def run():
        nf.fit_gp(x, y)
        mu, std = nf.mean_std(x[:2048])
        return mu

    # (a) monolithic reproduction
    t0 = time.perf_counter()
    force(run())
    print(json.dumps({"stage": "warmup_compile", "wall_s": round(time.perf_counter() - t0, 3)}), flush=True)
    for rep in range(9):
        t0 = time.perf_counter()
        force(run())
        print(json.dumps({"stage": "monolithic", "rep": rep,
                          "wall_s": round(time.perf_counter() - t0, 4)}), flush=True)

    # (b) per-stage timing of the same eager pipeline
    ko = nf.kernel_object
    ms = nf.ms
    s = nf.s
    for rep in range(6):
        rec = {"stage": "staged", "rep": rep}
        t = time.perf_counter()
        xj = as_array(x); yj = as_array(y).reshape(-1, 1)
        force(xj, yj)
        rec["t_transfer"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        nf.key, sub = jax.random.split(nf.key)
        C = jax.random.choice(sub, n, (ms,), replace=False)
        Cnp = np.asarray(C)  # the mid-pipeline host sync fit_gp does
        rec["t_choice_sync"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        xs = xj[Cnp]
        w = jnp.ones(ms, default_dtype())
        force(xs)
        rec["t_gather"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        Dw = jnp.diag(w)
        K = Dw @ ko.gram(xs) @ Dw
        force(K)
        rec["t_landmark_gram"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        D, V = jnp.linalg.eigh(K)
        Dinv = jnp.where(D > 1e-14, 1.0 / jnp.sqrt(jnp.clip(D, 1e-14, None)), 0.0)
        M = V * Dinv[None, :]
        force(M)
        rec["t_eigh"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        emb = (ko.cross(xj, xs) @ Dw) @ M   # the 50k x 512 embed
        force(emb)
        rec["t_embed_50k"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        Kf = emb.T @ emb + s**2 * jnp.eye(ms, dtype=xj.dtype)
        force(Kf)
        rec["t_KtK"] = round(time.perf_counter() - t, 4)

        # mean_std stages (note: recomputes the 50k embed AGAIN)
        t = time.perf_counter()
        emb_t = (ko.cross(xj[:2048], xs) @ Dw) @ M
        force(emb_t)
        rec["t_embed_test"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        Q2 = (ko.cross(xj, xs) @ Dw) @ M
        force(Q2)
        rec["t_embed_50k_AGAIN"] = round(time.perf_counter() - t, 4)

        t = time.perf_counter()
        L = safe_cholesky(Kf).L
        theta = cho_solve(L, Q2.T @ yj)
        ymean = emb_t @ theta
        temp = cho_solve(L, emb_t.T)
        diag = s**2 * jnp.einsum("ij,ji->i", emb_t, temp)
        force(ymean, diag)
        rec["t_chol_solves"] = round(time.perf_counter() - t, 4)

        rec["t_total"] = round(sum(v for kk, v in rec.items()
                                   if kk.startswith("t_") and kk != "t_total"), 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
