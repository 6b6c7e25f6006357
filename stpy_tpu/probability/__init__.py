from stpy_tpu.probability.likelihoods import (
    Likelihood,
    GaussianLikelihood,
    PoissonLikelihoodCanonical,
    BernoulliLikelihoodCanonical,
    LaplaceLikelihood,
    HuberLikelihood,
    WeibullLikelihoodCanonical,
    EllipsoidSet,
    LRSet,
)
from stpy_tpu.probability.noise_models import (
    NoiseModel,
    GaussianNoise,
    LaplaceNoise,
    HuberContaminatedNoise,
    BoundedNoise,
    MisspecifiedGaussianNoise,
    GumbelNoise,
    TwoSidedWeibullNoise,
    BernoulliNoise,
    PoissonNoise,
    LogWeibullNoise,
)
