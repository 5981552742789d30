from .sharding import (
    ShardedElasticity,
    ShardedPoisson,
    make_mesh,
    pad_elements,
)
from .sharded_gmg import ShardedGMG2D

__all__ = [
    "ShardedElasticity",
    "ShardedPoisson",
    "ShardedGMG2D",
    "make_mesh",
    "pad_elements",
]
