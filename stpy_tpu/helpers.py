"""Alias module mirroring the reference's `stpy/helpers/` package: one
import point for grids, quadrature, sampling, ellipsoids, transforms,
scores, coresets, and constrained-Gaussian sampling."""

from stpy_tpu.utils.helper import (  # noqa: F401
    cartesian,
    interval,
    interval_grid,
    logdet,
    symsqrt,
)
from stpy_tpu.utils.groups import generate_groups  # noqa: F401
from stpy_tpu.utils.sampling import (  # noqa: F401
    halton_sequence,
    randomly_split_set_without_duplicates,
    randomly_split_set_without_duplicates_balanced,
    rejection_sampling,
    sample_bounded,
    sample_qmc_halton,
    sample_uniform_sphere,
    vdc,
)
from stpy_tpu.utils.transforms import (  # noqa: F401
    haar_coefficients,
    haar_fisz_transform,
    haarval,
    inverse_haar_fisz_transform,
    r_score_std,
    transform,
)
from stpy_tpu.utils.coresets import (  # noqa: F401
    coreset,
    coreset_leverage_score_greedy,
    epsilon_net,
)
from stpy_tpu.opt.ellipsoid import (  # noqa: F401
    KY_initialization,
    ellipsoid_cut,
    maximize_on_elliptical_slice,
    maximize_quadratic_on_ellipse,
    maximum_volume_ellipsoid,
    minimize_quadratic_on_ellipse,
)
from stpy_tpu.inference.hmc import HmcSampler  # noqa: F401
from stpy_tpu.inference.tmg import tmg_sample as tmg  # noqa: F401
from stpy_tpu.embeddings.base import box_trig_integrals  # noqa: F401
