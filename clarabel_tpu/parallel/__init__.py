from .batch import BatchSolver, BatchSolution

__all__ = ["BatchSolver", "BatchSolution"]
