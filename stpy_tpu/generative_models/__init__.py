from stpy_tpu.generative_models.cvae import CVAE
