from stpy_tpu.embeddings.base import Embedding, box_trig_integrals
from stpy_tpu.embeddings.fourier import (
    RFFEmbedding,
    QuadratureEmbedding,
    TrapezoidalEmbedding,
    ClenshawCurtisEmbedding,
    HermiteEmbedding,
    OverCompleteHermiteEmbedding,
    MaternEmbedding,
    QuadPeriodicEmbedding,
    KLEmbedding,
    LatticeEmbedding,
)
from stpy_tpu.embeddings.combinators import (
    ConcatEmbedding,
    MaskedEmbedding,
    AdditiveEmbeddings,
    ProjectiveEmbeddings,
    WeightedEmbedding,
)
from stpy_tpu.embeddings.positive import (
    PositiveEmbedding,
    TriangleEmbedding,
    FaberSchauderEmbedding,
    KuhnExponentialEmbedding,
    BumpsEmbedding,
    CustomHaarBumps,
)
from stpy_tpu.embeddings.bernstein import (
    BernsteinEmbedding,
    BernsteinSplinesEmbedding,
    BernsteinSplinesOverlapping,
)
from stpy_tpu.embeddings.polynomial import (
    PolynomialEmbedding,
    ChebyschevEmbedding,
    CustomEmbedding,
    OnehotEmbedding,
)
from stpy_tpu.embeddings.nystrom import (
    NystromFeatures,
    OptimalPositiveBasis,
    PositiveNystromEmbeddingBump,
)
from stpy_tpu.embeddings.polynomial import PackingEmbedding
from stpy_tpu.embeddings.random_nn import RandomMap, RandomNestedMap, RandomOrthogonalMap
