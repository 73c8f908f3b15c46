"""Device-mesh parallelism: sharding specs for serving and training."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
