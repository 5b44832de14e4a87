"""Constraint module registry.

Parity: reference ``runtime/constraint_manager.py`` module loading.  Device
API contract for ``membrane_solver_tpu.constraints.<name>`` (all optional):

    constraint_gradient_rows(state, topo, params) -> (k, Nv, 3) array or None
        Stacked constraint gradients for KKT projection of the shape gradient
        (k static; inactive rows must be all-zero, they drop out of the solve).

    enforce(state, topo, params, strong=False) -> state
        Geometric projection onto the constraint manifold (used after mesh
        operations and optionally per line-search trial).  ``strong`` maps to
        the reference's finalize/mesh_operation contexts (more iterations).

    enforce_tilts(state, topo, params) -> state
        Tilt-field-only projection (rim matching families).
"""

from __future__ import annotations

import importlib
from types import ModuleType
from typing import Dict, Iterable

_CACHE: Dict[str, ModuleType] = {}


def any_live(arr) -> bool:
    """Trace-safe "does this padded validity table have any live entries?".

    Outside jit the concrete value decides; under tracing (topo.extras leaves
    are traced arguments of the jitted enforcer stack) the peek is impossible,
    so return True and let the all-False masks make the math a no-op.  Every
    enforce() early-out must use this instead of ``np.any(np.asarray(...))``
    (which raises TracerArrayConversionError under jit).
    """
    import numpy as np

    try:
        return bool(np.any(np.asarray(arr)))
    except Exception:
        return True


class ConstraintModuleManager:
    def __init__(self, module_names: Iterable[str] = ()):
        self.modules: Dict[str, ModuleType] = {}
        for name in module_names:
            self.modules[name] = get_constraint(name)

    def get_constraint(self, name: str) -> ModuleType:
        if name not in self.modules:
            self.modules[name] = get_constraint(name)
        return self.modules[name]


def get_constraint(name: str) -> ModuleType:
    if name not in _CACHE:
        _CACHE[name] = importlib.import_module(f"membrane_solver_tpu.constraints.{name}")
    return _CACHE[name]
