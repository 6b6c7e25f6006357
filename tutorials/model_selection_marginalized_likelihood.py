"""Tutorial: model selection by marginalized likelihood (evidence
maximization) — parity with the reference notebook
tutorials/model_selection_marginalized_likelihood.py.ipynb.

Covers: bandwidth fits, ARD, additive-group kernels, kernel algebra
(k1 + k2), noise co-estimation — each hyperfit ONE vmapped on-device L-BFGS.

Run: python tutorials/model_selection_marginalized_likelihood.py
(on CPU force: JAX_PLATFORMS=cpu)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models import GaussianProcess
from stpy_tpu.test_functions import Simple1DFunction


def main(show=False):
    rng = np.random.default_rng(0)

    # ---- 1-D bandwidth fit on the tutorial function -------------------------
    f = Simple1DFunction(d=1)
    x = rng.uniform(-0.5, 0.5, (64, 1))
    y = np.asarray(f.eval(x, sigma=0.05))
    xtest = np.linspace(-0.5, 0.5, 256)[:, None]

    gp = GaussianProcess(gamma=1.0, s=0.05, d=1)
    gp.fit_gp(x, y)
    print("evidence before:", float(gp.log_marginal(gp.kernel_object, {}, 1.0)))
    gp.optimize_params(type="bandwidth", restarts=8)
    print("evidence after: ", float(gp.log_marginal(gp.kernel_object, {}, 1.0)))
    print("fitted gamma:   ", float(gp.kernel_object.params_dict["0"]["gamma"]))

    # ---- bandwidth + noise ---------------------------------------------------
    gp2 = GaussianProcess(gamma=1.0, s=0.2, d=1)
    gp2.fit_gp(x, y)
    gp2.optimize_params(type="bandwidth+noise", restarts=8)
    print("fitted noise:   ", float(gp2.s))

    # ---- ARD on a 2-D function where only dim 0 matters ----------------------
    x2 = rng.uniform(-0.5, 0.5, (96, 2))
    y2 = np.sin(6 * x2[:, :1]) + 0.02 * rng.standard_normal((96, 1))
    kard = KernelFunction(kernel_name="ard", d=2, ard_gamma=np.ones(2))
    gp3 = GaussianProcess(kernel=kard, s=0.05)
    gp3.fit_gp(x2, y2)
    gp3.optimize_params(type="bandwidth", restarts=8)
    g = np.asarray(kard.params_dict["0"]["ard_gamma"])
    print("ARD lengthscales:", g, "(dim 1 should be much larger)")

    # ---- kernel algebra: k1 + k2 --------------------------------------------
    kadd = (
        KernelFunction(kernel_name="squared_exponential", gamma=0.1, d=1)
        + KernelFunction(kernel_name="linear", d=1)
    )
    gp4 = GaussianProcess(kernel=kadd, s=0.05)
    ylin = y + 0.7 * x  # add a linear trend
    gp4.fit_gp(x, ylin)
    gp4.optimize_params(type="bandwidth", restarts=8)
    mu, std = gp4.mean_std(xtest)
    print("composite-kernel posterior computed:", mu.shape)

    if show:
        gp.visualize(xtest, f_true=lambda t: f.eval_noiseless(t))
    return gp


if __name__ == "__main__":
    main()
