from . import distributed
from .batch import BatchSolver, BatchSolution
from .sharded import ShardedRowSolver
from .sparse_batch import SparseBatchSolver

__all__ = [
    "BatchSolver",
    "BatchSolution",
    "ShardedRowSolver",
    "SparseBatchSolver",
    "distributed",
]
