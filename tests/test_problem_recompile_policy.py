"""Recompile policy of Minimizer.problem() under global-parameter writes.

Dynamic-only keys (tilt_thetaB_value — written per iteration by the thetaB
scan and the legacy closed-form update) must refresh problem.params in
place; any other key change must rebuild the compiled problem (the padded
topology extras may depend on it).
"""

from __future__ import annotations

import numpy as np

from membrane_solver_tpu import Minimizer, load_data, parse_geometry


def _minimizer():
    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    return Minimizer(mesh, quiet=True)


def test_dynamic_only_key_refreshes_params_in_place():
    mn = _minimizer()
    mn.global_params.update({"tilt_thetaB_value": 0.1})
    p1 = mn.problem()
    mn.global_params.update({"tilt_thetaB_value": 0.2})
    p2 = mn.problem()
    assert p2 is p1  # no recompile
    assert abs(float(p2.params["tilt_thetaB_value"]) - 0.2) < 1e-15


def test_other_key_changes_still_recompile():
    mn = _minimizer()
    p1 = mn.problem()
    mn.global_params.update({"surface_tension": 2.0})
    p2 = mn.problem()
    assert p2 is not p1
    assert abs(float(p2.params["surface_tension"]) - 2.0) < 1e-15


def test_mixed_change_recompiles():
    mn = _minimizer()
    mn.global_params.update({"tilt_thetaB_value": 0.1})
    p1 = mn.problem()
    mn.global_params.update({"tilt_thetaB_value": 0.3, "surface_tension": 3.0})
    p2 = mn.problem()
    assert p2 is not p1


def test_device_state_preserved_across_fast_path():
    import dataclasses

    import jax.numpy as jnp

    mn = _minimizer()
    mn.global_params.update({"tilt_thetaB_value": 0.0})
    p1 = mn.problem()
    moved = jnp.asarray(np.asarray(p1.state.positions) + 0.01)
    p1.state = dataclasses.replace(p1.state, positions=moved)
    mn.global_params.update({"tilt_thetaB_value": 0.5})
    p2 = mn.problem()
    # the evolved device state must survive the in-place params refresh
    assert np.allclose(np.asarray(p2.state.positions), np.asarray(moved))
