"""Public routing API, mirroring `cuopt.routing`
(python/cuopt/cuopt/routing/): DataModel, SolverSettings, Solve,
Assignment, SolutionStatus, Objective.
"""

from cuopt_tpu.routing.assignment import (  # noqa: F401
    Assignment,
    Objective,
    SolutionStatus,
)
from cuopt_tpu.routing.data_model import DataModel  # noqa: F401
from cuopt_tpu.routing.settings import SolverSettings  # noqa: F401
from cuopt_tpu.routing.solver import Solve  # noqa: F401

__all__ = [
    "DataModel", "SolverSettings", "Solve", "Assignment",
    "SolutionStatus", "Objective",
]
