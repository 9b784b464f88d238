from mic_tpu.parallel.mesh import make_mesh  # noqa: F401
from mic_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    param_specs,
    shard_params,
)
