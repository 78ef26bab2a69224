from .sharding import (
    AXIS,
    make_mesh,
    replicated_sharding,
    shard_vector,
    state_shardings,
    vector_sharding,
)

__all__ = [
    "AXIS",
    "make_mesh",
    "replicated_sharding",
    "shard_vector",
    "state_shardings",
    "vector_sharding",
]
