from stpy_tpu.approx_inference.sgcp import SGCPVariational, VMF_SGCP
from stpy_tpu.approx_inference.expected_propagation import (
    ExpectedPropagationQuadratic,
)
