from clipself_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
