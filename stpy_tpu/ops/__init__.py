from stpy_tpu.ops.pallas_gram import gram, gram_se, gram_matern, gram_laplace
from stpy_tpu.ops.pallas_gram_matvec import gram_matvec, make_lazy_matvec
