from msmp_pde_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    dp_sharded_step,
)
