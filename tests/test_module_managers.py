"""Module-manager loading lanes using the dummy fixture modules.

Parity: the reference tests its importlib managers with
modules/{energy,constraints}/dummy_module.py fake plugins; same here.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_energy_manager_loads_dummy_and_caches():
    from membrane_solver_tpu.energy import EnergyModuleManager, get_module

    mgr = EnergyModuleManager(["dummy_module", "surface"])
    dm = mgr.get_module("dummy_module")
    assert hasattr(dm, "energy")
    assert mgr.get_module("dummy_module") is dm  # cached
    assert get_module("dummy_module") is dm  # shared registry cache


def test_energy_manager_rejects_module_without_energy():
    from membrane_solver_tpu.energy import get_module

    with pytest.raises((TypeError, ModuleNotFoundError)):
        get_module("contact_mapping_helpers_that_do_not_exist")


def test_constraint_manager_loads_dummy():
    from membrane_solver_tpu.constraints import ConstraintModuleManager

    mgr = ConstraintModuleManager(["dummy_module"])
    assert "dummy_module" in mgr.modules
    assert mgr.get_constraint("volume") is not None


def test_dummy_energy_module_traces_once_per_compile():
    """The dummy module's host-side CALLS counter increments at trace time
    only — repeated jitted evaluations must not re-enter Python."""
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.energy import dummy_module

    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    mesh.energy_modules.append("dummy_module")
    mn = Minimizer(mesh, quiet=True)
    before = dummy_module.CALLS["count"]
    e1 = float(mn.compute_energy())
    traced_after_first = dummy_module.CALLS["count"]
    e2 = float(mn.compute_energy())
    assert dummy_module.CALLS["count"] == traced_after_first  # no retrace
    assert traced_after_first >= before  # may hit a warm persistent cache
    assert e1 == e2
    # dummy contributes zero: energy equals the surface-only value
    breakdown = mn.compute_energy_breakdown()
    assert abs(float(breakdown.get("dummy_module", 0.0))) == 0.0


def test_uses_tilt_flags_read_from_module_attributes():
    from membrane_solver_tpu.energy import get_module, uses_tilt, uses_tilt_leaflets

    assert uses_tilt_leaflets(get_module("tilt_in"))
    assert not uses_tilt_leaflets(get_module("surface"))
    assert not uses_tilt(get_module("dummy_module"))
