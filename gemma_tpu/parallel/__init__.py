from .sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    cache_pspec,
    make_mesh,
    param_pspec,
    shard_cache,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "param_pspec",
    "cache_pspec",
    "shard_params",
    "shard_cache",
]
