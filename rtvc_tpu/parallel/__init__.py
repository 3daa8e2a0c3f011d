from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_shardings,
    data_parallel_shardings,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_shardings",
    "data_parallel_shardings",
]
