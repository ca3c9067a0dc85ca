"""clarabel_tpu: a TPU-native interior-point conic solver.

A from-scratch JAX/XLA re-design with the capabilities of the reference
Clarabel solver (oxfordcontrol/Clarabel.rs): convex conic programs with
quadratic objectives over zero / nonnegative / second-order / exponential /
power / generalized-power / PSD-triangle cones, with a homogeneous embedding
that handles quadratic objectives directly, Mehrotra predictor-corrector
steps, Nesterov-Todd scalings, and certificate-producing infeasibility
detection.

The entire numeric path — Ruiz equilibration, the IPM loop, KKT
factorization and solution extraction — is one jitted XLA computation,
vmappable over problem batches and shardable over TPU meshes.
"""

from .cones.api import (
    ExponentialConeT,
    GenPowerConeT,
    NonnegativeConeT,
    PowerConeT,
    PSDTriangleConeT,
    SecondOrderConeT,
    ZeroConeT,
)
from .buildinfo import buildinfo, print_buildinfo
from .infbound import default_infinity, get_infinity, set_infinity
from .parallel import (
    BatchSolution,
    BatchSolver,
    ShardedRowSolver,
    SparseBatchSolver,
)
from .settings import DefaultSettings, SettingsError
from .solver import DefaultInfo, DefaultSolution, DefaultSolver
from .statuses import SolverStatus

__version__ = "0.2.0"

__all__ = [
    "DefaultSolver",
    "BatchSolver",
    "SparseBatchSolver",
    "BatchSolution",
    "ShardedRowSolver",
    "DefaultSettings",
    "DefaultSolution",
    "DefaultInfo",
    "SolverStatus",
    "SettingsError",
    "ZeroConeT",
    "NonnegativeConeT",
    "SecondOrderConeT",
    "ExponentialConeT",
    "PowerConeT",
    "GenPowerConeT",
    "PSDTriangleConeT",
    "get_infinity",
    "set_infinity",
    "default_infinity",
    "buildinfo",
    "print_buildinfo",
    "__version__",
]
