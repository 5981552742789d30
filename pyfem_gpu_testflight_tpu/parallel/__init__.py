from .sharding import (
    ShardedElasticity,
    ShardedPoisson,
    make_mesh,
    pad_elements,
)
from .sharded_gmg import ShardedGMG2D, ShardedGMG3D
from .sharded_amg import ShardedAMGPCG, sharded_amg_pcg

__all__ = [
    "ShardedElasticity",
    "ShardedPoisson",
    "ShardedGMG2D",
    "ShardedGMG3D",
    "ShardedAMGPCG",
    "sharded_amg_pcg",
    "make_mesh",
    "pad_elements",
]
