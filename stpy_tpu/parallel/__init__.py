from stpy_tpu.parallel.mesh import (
    make_mesh,
    shard_rows,
    replicate,
    sharded_gram,
    distributed_evidence,
    restart_farm,
)
