from stpy_tpu.models.estimator import Estimator
from stpy_tpu.models.exact_gp import GaussianProcess
from stpy_tpu.models.feature_gp import KernelizedFeatures
from stpy_tpu.models.fourier_gp import GaussianProcessFF, sample_embedding
from stpy_tpu.models.mkl import MKL, MultipleKernelLearner, PrimalMKL
from stpy_tpu.models.mixtures import CategoricalMixture, DirichletMixture
from stpy_tpu.models.trace_features import TraceFeatures
from stpy_tpu.models.truncated_features import TruncatedKernelizedFeatures
from stpy_tpu.models.convex_rkhs import ConvexRKHS
from stpy_tpu.models.gamma_process import GammaContProcess
from stpy_tpu.models.online_gp import OnlineGP
