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
