"""Guard the public API surface promised by docs/MIGRATION.md — every
import in the migration table must keep working."""


def test_migration_table_imports():
    from stpy_tpu.domains import (          # noqa: F401
        BallSet, BorelSet, CandidateDiscreteSet, CandidateSet,
        HierarchicalBorelSets, Node,
    )
    from stpy_tpu.kernels import KernelFunction            # noqa: F401
    from stpy_tpu.models.estimator import Estimator        # noqa: F401
    from stpy_tpu.viz import RandomProcess                 # noqa: F401
    from stpy_tpu.models import (           # noqa: F401
        ConvexRKHS, DirichletMixture, CategoricalMixture, GammaContProcess,
        GaussianProcess, GaussianProcessFF, KernelizedFeatures, MKL,
        MultipleKernelLearner, PrimalMKL, TraceFeatures,
        TruncatedKernelizedFeatures,
    )
    from stpy_tpu.embeddings import (       # noqa: F401
        AdditiveEmbeddings, BernsteinEmbedding, BernsteinSplinesEmbedding,
        BernsteinSplinesOverlapping, BumpsEmbedding, ChebyschevEmbedding,
        ClenshawCurtisEmbedding, ConcatEmbedding, CustomEmbedding,
        CustomHaarBumps, FaberSchauderEmbedding, HermiteEmbedding,
        KLEmbedding, KuhnExponentialEmbedding, LatticeEmbedding,
        MaskedEmbedding, MaternEmbedding, NystromFeatures,
        OptimalPositiveBasis, OverCompleteHermiteEmbedding,
        PackingEmbedding, PolynomialEmbedding,
        PositiveNystromEmbeddingBump, ProjectiveEmbeddings,
        QuadPeriodicEmbedding, QuadratureEmbedding, RFFEmbedding, RandomMap,
        RandomNestedMap, RandomOrthogonalMap, TrapezoidalEmbedding,
        TriangleEmbedding, WeightedEmbedding,
    )
    from stpy_tpu.point_processes import (  # noqa: F401
        BernoulliPointProcess, BernoulliRateEstimator,
        ExpGaussProcessRateEstimator, LogGaussProcessRateEstimator,
        LogLinearRateEstimator, LogisticGaussProcessRateEstimator,
        MBRPositiveEstimator, PermanentalProcessRateEstimator,
        PoissonPointProcess, PoissonRateEstimator, RateEstimator,
    )
    from stpy_tpu.probability import (      # noqa: F401
        BernoulliLikelihoodCanonical, GaussianLikelihood, GaussianNoise,
        HuberLikelihood, LaplaceLikelihood, Likelihood, NoiseModel,
        PoissonLikelihoodCanonical, RobustGraphicalLikelihood,
        WeibullLikelihoodCanonical, WeilbullLikelihoodCanonical,
    )
    from stpy_tpu.regularization import Regularizer        # noqa: F401
    from stpy_tpu.regularization.constraints import Constraints  # noqa: F401
    from stpy_tpu.opt import bisection, newton_solve       # noqa: F401
    from stpy_tpu.inference import (        # noqa: F401
        HmcSampler, LangevinSampler, MirrorLangevin, ProximalLangevin,
        mirror_langevin_box, proximal_langevin, tmg, ula,
    )
    from stpy_tpu.approx_inference import VMF_SGCP         # noqa: F401
    from stpy_tpu.helpers import (          # noqa: F401
        cartesian, interval, maximize_on_elliptical_slice,
    )
    from stpy_tpu.embeddings.base import box_trig_integrals  # noqa: F401
    from stpy_tpu.test_functions import (   # noqa: F401
        BenchmarkFunction, FelSimulator, ProteinBenchmark, ProteinOperator,
    )
    from stpy_tpu.generative_models import CVAE            # noqa: F401
    from stpy_tpu.dimred import SRI                        # noqa: F401
    from stpy_tpu.feature_importance import FeatureRanker  # noqa: F401
    from stpy_tpu.parallel import (         # noqa: F401
        DistributedExactGP, IterativeGP, cg_solve_block,
        evidence_value_and_grad_lazy, make_lazy_matvec,
        make_lazy_matvec_sharded,
    )
    from stpy_tpu.configs import (          # noqa: F401
        GPConfig, KernelConfig, PoissonRateConfig,
    )
