"""Device-mesh setup and sharding helpers (the reference's dist_util equivalent)."""

from humanliff_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_stage1_params,
    data_parallel_jit,
    stage2_zero_shardings,
    place_with_shardings,
    zero_parallel_jit,
)
