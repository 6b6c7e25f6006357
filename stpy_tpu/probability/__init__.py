from stpy_tpu.probability.likelihoods import (
    Likelihood,
    GaussianLikelihood,
    PoissonLikelihoodCanonical,
    BernoulliLikelihoodCanonical,
    LaplaceLikelihood,
    HuberLikelihood,
    WeibullLikelihoodCanonical,
    RobustGraphicalLikelihood,
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

# reference-compat alias: the reference spells it "Weilbull"
# (stpy/probability/weibul_likelihood.py:9)
WeilbullLikelihoodCanonical = WeibullLikelihoodCanonical
