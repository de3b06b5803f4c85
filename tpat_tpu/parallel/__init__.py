from tpat_tpu.parallel.distributed import (  # noqa: F401
    init_distributed_mode,
    is_main_process,
    print_rank0,
)
from tpat_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from tpat_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding_2d,
    make_mesh_2d,
    param_shardings,
    shard_params,
)
