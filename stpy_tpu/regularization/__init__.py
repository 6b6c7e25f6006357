from stpy_tpu.regularization.regularizer import (
    Regularizer,
    L2Regularizer,
    L1Regularizer,
    GroupL1L2Regularizer,
    NonConvexLqRegularizer,
    GroupNonConvexLqRegularizer,
    NestedGroupL1L2Regularizer,
)
from stpy_tpu.regularization.simplex_regularizer import (
    ProbabilityRegularizer,
    SupRegularizer,
    DirichletRegularizer,
    WeightedAitchisonRegularizer,
    L1MeasureRegularizer,
)
from stpy_tpu.regularization.constraints import (
    Constraints,
    CustomConstraint,
    LinearConstraint,
    AbsoluteValueConstraint,
    QuadraticInequalityConstraint,
    NonConvexNormConstraint,
    NonConvexGroupNormConstraint,
    SDPConstraint,
)
