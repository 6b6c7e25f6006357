from stpy_tpu.test_functions.benchmarks import (
    BenchmarkFunction,
    CamelbackBenchmark,
    QuadraticBenchmark,
    PolynomialBenchmark,
    MichalBenchmark,
    StybTangBenchmark,
    GeneralizedAdditiveOverlap,
    CustomBenchmark,
    GaussianProcessSample,
    KernelizedSample,
    Simple1DFunction,
    MultiRKHS,
    LinearBenchmark,
)
from stpy_tpu.test_functions.protein_benchmark import (
    ProteinBenchmark,
    ProteinOperator,
)
from stpy_tpu.test_functions.swissfel_simulator import FelSimulator
