"""Tutorial: exact GP vs Hermite quadrature Fourier features — parity with
the reference notebook tutorials/fourier-features.ipynb.

Shows: posterior match between the exact GP and the QFF feature GP,
pathwise (Matheron) sampling, and the approximation-error decay in m.

Run: python tutorials/fourier_features.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from stpy_tpu.embeddings import HermiteEmbedding
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess, KernelizedFeatures


def main(show=False):
    rng = np.random.default_rng(1)
    gamma, s = 0.35, 0.05
    x = rng.uniform(-1, 1, (48, 1))
    y = np.sin(4 * x) + s * rng.standard_normal((48, 1))
    xtest = np.linspace(-1, 1, 256)[:, None]

    gp = GaussianProcess(gamma=gamma, s=s, d=1)
    gp.fit_gp(x, y)
    mu_e, std_e = gp.mean_std(xtest)

    print("m    | max |mu_qff - mu_exact| | max |std_qff - std_exact|")
    for m in [16, 32, 64, 128]:
        emb = HermiteEmbedding(gamma=gamma, m=m, d=1)
        F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=s, d=1)
        F.fit_gp(x, y)
        mu_f, std_f = F.mean_std(xtest)
        err_mu = float(np.abs(np.asarray(mu_f) - np.asarray(mu_e)).max())
        err_std = float(np.abs(np.asarray(std_f) - np.asarray(std_e)).max())
        print(f"{m:4d} | {err_mu:24.2e} | {err_std:24.2e}")

    # pathwise posterior samples (Matheron) vs exact posterior samples
    emb = HermiteEmbedding(gamma=gamma, m=128, d=1)
    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=s, d=1)
    F.fit_gp(x, y)
    k = KernelFunction(kernel_name="squared_exponential", gamma=gamma, d=1)
    paths = F.sample_matheron(xtest, k, size=8, key=jax.random.PRNGKey(0))
    print("Matheron paths:", paths.shape)

    if show:
        import matplotlib.pyplot as plt

        plt.plot(xtest, np.asarray(mu_e), "k", lw=2, label="exact GP")
        plt.fill_between(
            xtest[:, 0],
            (np.asarray(mu_e) - 2 * np.asarray(std_e))[:, 0],
            (np.asarray(mu_e) + 2 * np.asarray(std_e))[:, 0],
            alpha=0.2,
        )
        plt.plot(xtest, np.asarray(paths), alpha=0.5)
        plt.plot(x, y, "ro")
        plt.legend()
        plt.show()
    return F


if __name__ == "__main__":
    main()
