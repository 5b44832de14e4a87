from membrane_solver_tpu.core.exceptions import (
    BodyOrientationError,
    InvalidEdgeIndexError,
    MembraneSolverError,
)
from membrane_solver_tpu.core.expr import eval_expr
from membrane_solver_tpu.core.ordered_set import OrderedUniqueList
from membrane_solver_tpu.core.parameters import GlobalParameters, ParameterResolver

__all__ = [
    "GlobalParameters",
    "ParameterResolver",
    "OrderedUniqueList",
    "eval_expr",
    "MembraneSolverError",
    "InvalidEdgeIndexError",
    "BodyOrientationError",
]
