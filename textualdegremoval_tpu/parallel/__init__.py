from textualdegremoval_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
from textualdegremoval_tpu.parallel.bootstrap import (
    init_distributed,
    is_main_process,
    resolve_rendezvous,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "data_sharding",
    "init_distributed", "is_main_process", "resolve_rendezvous",
]
