from stpy_tpu.opt.lbfgs import minimize_lbfgs, LBFGSResult
from stpy_tpu.opt.prox import (
    prox_box,
    prox_l1,
    prox_group_l2,
    project_simplex,
    projected_fista,
    projected_gradient,
)
from stpy_tpu.opt.scalar import bisection, newton_1d
from stpy_tpu.opt.ellipsoid import maximize_on_elliptical_slice
from stpy_tpu.opt.frank_wolfe import frank_wolfe_step, exponentiated_gradient_step, minimize_on_simplex
from stpy_tpu.opt.custom import newton_solve, greedy_per_step, matrix_recovery_hermitian_trace_regression
from stpy_tpu.opt.manifold import optimize_stiefel, optimize_psd
from stpy_tpu.opt.ellipsoid import maximum_volume_ellipsoid, ellipsoid_cut, KY_initialization
