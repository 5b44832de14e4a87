"""Optimizer behavior lanes mirroring reference test classes.

- rejected steps leave the state untouched (reference
  test_line_search_failure_state_restore.py — immutability here, but the
  observable contract is identical);
- zero-step early termination after max_zero_steps consecutive failures
  at the step-size floor (reference minimizer.py:1426-1450);
- adaptive step-size growth on success (line_search.py: alpha*GAMMA,
  capped) vs the fixed mode's constant step (test_step_size_mode.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry


def _cube(**gp):
    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    mesh.global_parameters.update(gp)
    return Minimizer(mesh, quiet=True)


def test_rejected_steps_leave_positions_untouched():
    # an enormous fixed step always fails the normal-rotation safety or
    # the Armijo test; every position must remain bit-identical
    mn = _cube(step_size_mode="fixed", step_size=1e6)
    mn.step_size = 1e6
    before = np.array([v.position.copy() for v in mn.mesh.vertices.values()])
    res = mn.minimize(3)
    mn._sync_host()
    after = np.array([v.position.copy() for v in mn.mesh.vertices.values()])
    np.testing.assert_array_equal(before, after)
    assert not res.get("converged", False)


def test_zero_step_early_termination():
    mn = _cube(
        step_size_mode="fixed",
        step_size=1e6,
        max_zero_steps=3,
        step_size_floor=1e7,  # floor above the step: every failure counts
    )
    mn.step_size = 1e6
    res = mn.minimize(50)
    # terminated after max_zero_steps consecutive failed steps, not 50
    assert int(res["iterations"]) <= 10
    assert res.get("terminated_early") or int(res["iterations"]) < 50


def test_adaptive_step_grows_on_success_fixed_does_not():
    mn = _cube(step_size_mode="adaptive")
    mn.step_size = 1e-3
    mn.minimize(5)
    grown = float(mn.step_size)
    assert grown > 1e-3  # accepted steps grow alpha by LS_GAMMA

    mn2 = _cube(step_size_mode="fixed", step_size=1e-3)
    mn2.step_size = 1e-3
    mn2.minimize(5)
    assert float(mn2.step_size) == pytest.approx(1e-3)

    # both still descend the energy
    assert float(mn.compute_energy()) < 6.0
    assert float(mn2.compute_energy()) < 6.0
