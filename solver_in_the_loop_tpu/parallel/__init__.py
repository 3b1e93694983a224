from solver_in_the_loop_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    replicated_sharding,
    shard_batch,
)
