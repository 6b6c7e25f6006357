from stpy_tpu.point_processes.poisson import (
    PoissonPointProcess,
    SeasonalPoissonPointProcess,
)
from stpy_tpu.point_processes.rate_estimator import RateEstimator
from stpy_tpu.point_processes.poisson_rate_estimator import PoissonRateEstimator
from stpy_tpu.point_processes.link_estimators import (
    PermanentalProcessRateEstimator,
    LogisticGaussProcessRateEstimator,
    ExpGaussProcessRateEstimator,
    LogGaussProcessRateEstimator,
)
from stpy_tpu.point_processes.loglinear import LogLinearRateEstimator
from stpy_tpu.point_processes.mbr_estimator import MBRPositiveEstimator
from stpy_tpu.point_processes.binomial import (
    BernoulliPointProcess,
    BernoulliRateEstimator,
    LinkBernoulliRateEstimator,
)
