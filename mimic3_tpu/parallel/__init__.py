"""Device-mesh parallelism: sharding specs for serving and training."""

from .distributed import (  # noqa: F401
    initialize_distributed,
    make_global_mesh,
    process_local_batch_slice,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
