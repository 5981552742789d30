from .sharding import (
    ShardedElasticity,
    ShardedPoisson,
    make_mesh,
    pad_elements,
)

__all__ = ["ShardedElasticity", "ShardedPoisson", "make_mesh", "pad_elements"]
