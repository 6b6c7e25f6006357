from stpy_tpu.kernels import functions
from stpy_tpu.kernels.kernel_function import KernelFunction
