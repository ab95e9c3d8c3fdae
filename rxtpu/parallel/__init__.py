from rxtpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
    sharded_prefetch,
)
from rxtpu.parallel.dp import place_state, make_put  # noqa: F401
