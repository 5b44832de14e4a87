"""Energy module registry.

Parity: reference ``runtime/energy_manager.py`` (importlib loader keyed by
module name).  Device API contract for a module ``membrane_solver_tpu.energy.<name>``:

    energy(geo, state, topo, params) -> scalar jnp energy

with ``geo`` a :class:`membrane_solver_tpu.device.geo.TriangleGeometry` built
from ``state.positions``, ``topo`` the padded topology and ``params`` the
dynamic scalar-parameter pytree.  Modules must be pure JAX: gradients are
taken by ``jax.grad`` through them (the analog of the reference's mandatory
``compute_energy_and_gradient_array`` contract, runtime/minimizer.py:235-243).

Optional module attributes:
    USES_TILT           bool (default False)
    USES_TILT_LEAFLETS  bool (default False)
"""

from __future__ import annotations

import importlib
from types import ModuleType
from typing import Dict, Iterable

_CACHE: Dict[str, ModuleType] = {}


class EnergyModuleManager:
    """Loads energy modules by name from this package."""

    def __init__(self, module_names: Iterable[str] = ()):  # mirrors reference ctor
        self.modules: Dict[str, ModuleType] = {}
        for name in module_names:
            self.modules[name] = get_module(name)

    def get_module(self, name: str) -> ModuleType:
        if name not in self.modules:
            self.modules[name] = get_module(name)
        return self.modules[name]


def get_module(name: str) -> ModuleType:
    if name not in _CACHE:
        _CACHE[name] = importlib.import_module(f"membrane_solver_tpu.energy.{name}")
        if not hasattr(_CACHE[name], "energy"):
            raise TypeError(f"Energy module {name!r} lacks an `energy` function")
    return _CACHE[name]


def uses_tilt(module: ModuleType) -> bool:
    return bool(getattr(module, "USES_TILT", False))


def uses_tilt_leaflets(module: ModuleType) -> bool:
    return bool(getattr(module, "USES_TILT_LEAFLETS", False))
