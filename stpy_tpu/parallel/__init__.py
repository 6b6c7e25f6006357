from stpy_tpu.parallel.mesh import (
    make_mesh,
    shard_rows,
    replicate,
    sharded_gram,
    distributed_evidence,
    restart_farm,
)
from stpy_tpu.parallel.iterative import (
    IterativeGP,
    cg_solve,
    lowrank_eigen_precond,
    make_pivchol_precond,
    nystrom_precond_from_cross,
    pivoted_cholesky_kernel,
    randomized_eig_precond,
    rayleigh_nystrom_precond,
)
from stpy_tpu.parallel.slq import slq_logdet, slq_trace_fn, evidence_matvec_only
from stpy_tpu.parallel.blocked import (
    blocked_cholesky,
    chol_sharded,
    chol_sharded_rec,
    DistributedExactGP,
)
from stpy_tpu.ops.pallas_gram_matvec import gram_matvec, make_lazy_matvec
from stpy_tpu.parallel.bbmm import (
    evidence_value_and_grad_general,
    evidence_value_and_grad_lazy,
    evidence_value_and_grad_sum,
    fit_evidence_general,
    fit_evidence_lazy,
    fit_evidence_sum,
)
from stpy_tpu.parallel.lazy_kernel import (
    fast_atoms,
    make_chunked_matmat,
    make_chunked_matvec,
    make_sum_matmat,
    make_sum_matvec,
)
from stpy_tpu.ops.pallas_gram_matvec import (
    gram_matmat,
    make_lazy_matmat,
    make_lazy_matvec_sharded,
)
from stpy_tpu.parallel.iterative import cg_solve_block
from stpy_tpu.parallel.data import (
    host_sharded,
    HostShardedLoader,
    streamed_feature_stats,
    fit_feature_gp_sharded,
)
