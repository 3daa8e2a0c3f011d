from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_shardings,
    place_params,
    data_parallel_shardings,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_shardings",
    "place_params",
    "data_parallel_shardings",
]
