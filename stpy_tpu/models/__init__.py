from stpy_tpu.models.estimator import Estimator
from stpy_tpu.models.exact_gp import GaussianProcess
from stpy_tpu.models.feature_gp import KernelizedFeatures
