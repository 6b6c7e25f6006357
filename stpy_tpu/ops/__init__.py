from stpy_tpu.ops.pallas_gram import gram, gram_se, gram_matern
