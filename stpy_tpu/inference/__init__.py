from stpy_tpu.inference.langevin import (
    LangevinSampler,
    ula,
    projected_langevin,
    proximal_langevin,
    mirror_langevin_box,
    mirror_langevin_positive,
    mla_prime_positive,
    newton_langevin,
    MirrorLangevin,
    ProximalLangevin,
)
from stpy_tpu.inference.hmc import hmc_sample, HmcSampler
from stpy_tpu.inference.tmg import tmg_sample
