from ..ops.fused import kernels_on_mesh
from .sharding import (
    AXIS,
    init_distributed,
    make_mesh,
    replicated_sharding,
    shard_vector,
    state_shardings,
    vector_sharding,
)

__all__ = [
    "AXIS",
    "init_distributed",
    "kernels_on_mesh",
    "make_mesh",
    "replicated_sharding",
    "shard_vector",
    "state_shardings",
    "vector_sharding",
]
