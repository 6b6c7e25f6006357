"""End-to-end Bayesian-optimization loop: OnlineGP + UCB on the Camelback
benchmark — the reference's primary workflow (BO with GP surrogates,
test_functions/benchmarks.py + gauss_procc.ucb_optimize), run with the
jit-stable capacity-padded OnlineGP so the whole loop is recompile-free."""

import jax
import jax.numpy as jnp
import numpy as np

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models.online_gp import OnlineGP
from stpy_tpu.test_functions import CamelbackBenchmark


def test_bo_ucb_loop_improves_on_camelback():
    bench = CamelbackBenchmark()
    xtest = bench.interval(40)                     # candidate grid (1600, 2)
    f_true = np.asarray(bench.eval_noiseless(xtest)).ravel()
    f_star = f_true.max()

    k = KernelFunction(kernel_name="squared_exponential", gamma=0.15, d=2)
    gp = OnlineGP(k, s=0.05, capacity=64, d=2)

    rng = np.random.default_rng(0)
    # seed with 5 random evaluations
    idx0 = rng.choice(xtest.shape[0], 5, replace=False)
    for i in idx0:
        x = xtest[int(i)][None, :]
        gp.add_data_point(x, bench.eval(x, sigma=0.01))

    best = float(np.asarray(gp.y).max())
    for _ in range(25):
        ucb = np.asarray(gp.ucb(xtest, beta=2.0)).ravel()
        j = int(np.argmax(ucb))
        x = xtest[j][None, :]
        y = bench.eval(x, sigma=0.01)
        gp.add_data_point(x, y)
        best = max(best, float(y[0, 0]))

    # BO should get within noise-level of the grid optimum; random search
    # with 30 samples typically leaves a much larger gap
    assert f_star - best < 0.05, (best, f_star)
    # and the loop must have stayed within capacity padding (no growth)
    assert gp.count == 30
