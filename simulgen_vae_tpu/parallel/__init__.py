from simulgen_vae_tpu.parallel.mesh import (  # noqa: F401
    is_primary,
    make_mesh,
    sync_processes,
)
from simulgen_vae_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    place_global,
    shard_state,
)
