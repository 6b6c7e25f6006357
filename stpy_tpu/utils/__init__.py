from stpy_tpu.utils.helper import (
    cartesian,
    interval,
    interval_grid,
    logdet,
    symsqrt,
)
