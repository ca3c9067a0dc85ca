from . import distributed
from .batch import BatchSolver, BatchSolution
from .sharded import ShardedRowSolver

__all__ = ["BatchSolver", "BatchSolution", "ShardedRowSolver", "distributed"]
