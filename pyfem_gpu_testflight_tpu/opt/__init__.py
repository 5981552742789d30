from .mma import MMA, Problem
from .topo import TopoProblem, optimize_topology

__all__ = ["MMA", "Problem", "TopoProblem", "optimize_topology"]
