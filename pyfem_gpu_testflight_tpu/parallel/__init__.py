from .sharding import (
    ShardedElasticity,
    ShardedPoisson,
    make_mesh,
    pad_elements,
)
from .sharded_gmg import ShardedGMG2D, ShardedGMG3D

__all__ = [
    "ShardedElasticity",
    "ShardedPoisson",
    "ShardedGMG2D",
    "ShardedGMG3D",
    "make_mesh",
    "pad_elements",
]
