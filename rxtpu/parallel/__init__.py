from rxtpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_batch_window,
    sharded_prefetch,
)
from rxtpu.parallel.dp import place_state, make_put  # noqa: F401
from rxtpu.parallel.multihost import (  # noqa: F401
    assemble_global_batch,
    host_shard_bounds,
    initialize_distributed,
    multihost_prefetch,
    shard_records_for_host,
)
