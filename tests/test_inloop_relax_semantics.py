"""Reference in-loop relax semantics (round-3 theta-parity root causes).

The reference's inner tilt relax does NOT optimize the clean energy:

* tilt_in/tilt_out route through the evaluation manager's lumped magnitude
  fast path (reference evaluation_manager.py:561-575, 658-691), bypassing
  ``tilt_mass_mode_* = consistent`` and active-row weights;
* the out-leaflet Jacobi preconditioner mass term uses the leaflet-present
  (absent-masked) vertex areas (reference tilt_relaxation.py:675-697,
  preconditioners.py:62-146);
* on theta_B-scan iterations the minimize order is relax -> scan -> step
  with no re-relax (reference minimizer.py:1226-1360).

These pins guard the bit-exact relax parity measured on the i50 interface
lane (2.8e-18 max tilt delta over 120 CG iterations vs the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.runtime import tilt_relax


@pytest.fixture(scope="module")
def kozlov_problem():
    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(
        {
            "tilt_solve_mode": "coupled",
            "tilt_step_size": 0.15,
            "tilt_inner_steps": 8,
            "tilt_tol": 1e-10,
        }
    )
    mn = Minimizer(mesh, quiet=True)
    return mn


def _consistent_spec(mn):
    mn.global_params.set("tilt_mass_mode_in", "consistent")
    mn.invalidate()
    p = mn.problem()
    mn.global_params.unset("tilt_mass_mode_in")
    mn.invalidate()
    return p


def test_inloop_tilt_energy_is_lumped_even_in_consistent_mode(kozlov_problem):
    """make_tilt_energy must use the lumped fast path for tilt_in/tilt_out
    regardless of tilt_mass_mode (the clean total honors consistent)."""
    mn = kozlov_problem
    p = _consistent_spec(mn)
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.runtime import jit_core

    params = build_params(mn.mesh)
    rng = np.random.default_rng(7)
    tin = jnp.asarray(
        rng.normal(0, 0.05, p.state.tilts_in.shape), p.state.positions.dtype
    )
    import dataclasses

    st = dataclasses.replace(p.state, tilts_in=tin)

    inloop = float(tilt_relax.make_tilt_energy(p.spec)(st, p.topo, params))
    clean = float(jit_core.make_total_energy(p.spec)(st, p.topo, params))

    # compute the lumped and consistent tilt_in terms directly
    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.energy.tilt_leaflet import leaflet_energy

    geo = dgeo.triangle_geometry(st.positions, p.topo.tri_rows, p.topo.tri_valid)
    k = params["tilt_modulus_in"]
    lumped = float(leaflet_energy(geo, st.tilts_in, p.topo, k, "lumped"))
    consistent = float(leaflet_energy(geo, st.tilts_in, p.topo, k, "consistent"))
    assert lumped != pytest.approx(consistent, rel=1e-6)  # test is non-vacuous

    # in-loop total carries the LUMPED tilt_in term, clean the CONSISTENT one
    assert inloop - clean == pytest.approx(lumped - consistent, rel=1e-9, abs=1e-12)


def test_frozen_inloop_matches_unfrozen_inloop_in_consistent_mode(kozlov_problem):
    """The frozen program and the unfrozen fallback must agree on the
    in-loop objective (both lumped) even when the clean energy is
    consistent-mass."""
    mn = kozlov_problem
    p = _consistent_spec(mn)
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.energy.tilt_in import make_inloop_energy, make_tilt_frozen

    params = build_params(mn.mesh)
    rng = np.random.default_rng(11)
    import dataclasses

    tin = jnp.asarray(
        rng.normal(0, 0.05, p.state.tilts_in.shape), p.state.positions.dtype
    )
    st = dataclasses.replace(p.state, tilts_in=tin)
    from membrane_solver_tpu.device import geo as dgeo

    geo = dgeo.triangle_geometry(st.positions, p.topo.tri_rows, p.topo.tri_valid)
    e_unfrozen = float(make_inloop_energy(p.spec)(geo, st, p.topo, params))
    pre, efn = make_tilt_frozen(p.spec)
    fr = pre(st, p.topo, params)
    e_frozen = float(efn(st.tilts_in, st.tilts_out, fr, p.topo, params))
    assert e_frozen == pytest.approx(e_unfrozen, rel=1e-12, abs=1e-15)


def test_out_preconditioner_uses_absent_masked_areas(kozlov_problem):
    """On a lane with leaflet-out-absent disk triangles, the out diag must
    differ from the in diag (reference preconditioners.py:108-109 with the
    masked tilt_vertex_areas_out)."""
    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(
        {
            "leaflet_out_absent_presets": ["disk"],
            "leaflet_out_absence_mode": "triangles",
        }
    )
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.energy.leaflet_presence import present_triangles

    params = build_params(mn.mesh)
    m_in, m_out = tilt_relax.jacobi_preconditioner(p.state.positions, p.topo, params)
    present_out = present_triangles(p.topo, "out")
    assert present_out is not None, "absent-out machinery must activate"
    assert not np.allclose(np.asarray(m_in), np.asarray(m_out))


def test_scan_iteration_relaxes_before_scoring(monkeypatch):
    """On theta_B-scan iterations the minimizer must run the iteration's
    guarded tilt relax BEFORE calling the scan (reference order
    relax -> scan -> step): the state the scan scores equals
    guarded_relax(entry-after-enforcement) exactly."""
    scan_gp = {
        "tilt_solve_mode": "coupled",
        "tilt_step_size": 0.15,
        "tilt_inner_steps": 6,
        "tilt_tol": 1e-10,
        "tilt_thetaB_optimize": True,
        "tilt_thetaB_optimize_every": 1,
        "tilt_thetaB_optimize_delta": 0.01,
        "tilt_thetaB_optimize_inner_steps": 4,
        "tilt_thetaB_value": 0.05,
    }

    def fresh():
        mesh = parse_geometry(build("kozlov_1disk"))
        mesh.global_parameters.update(scan_gp)
        return Minimizer(mesh, quiet=True)

    # capture the state the scan actually scores
    from membrane_solver_tpu.runtime import tilt_optimization as topt

    captured = {}
    orig = topt.optimize_thetaB_scalar

    def spy(minimizer, *, tilt_mode, iteration):
        if "tin" not in captured:
            p = minimizer.problem()
            captured["tin"] = np.asarray(p.state.tilts_in)
            captured["tout"] = np.asarray(p.state.tilts_out)
        return orig(minimizer, tilt_mode=tilt_mode, iteration=iteration)

    monkeypatch.setattr(topt, "optimize_thetaB_scalar", spy)
    mn = fresh()
    mn.minimize(1)
    assert "tin" in captured, "scan did not fire"

    # expected: minimize-entry enforcement then the guarded relax
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.runtime import jit_core

    mn2 = fresh()
    mn2.enforce_constraints_after_mesh_ops()
    p2 = mn2.problem()
    params = build_params(mn2.mesh)
    grelax = jit_core.make_guarded_relax(p2.spec)
    st = grelax(p2.state, p2.topo, params, jnp.asarray(6, jnp.int32))

    np.testing.assert_allclose(captured["tin"], np.asarray(st.tilts_in), atol=1e-14)
    np.testing.assert_allclose(captured["tout"], np.asarray(st.tilts_out), atol=1e-14)
    assert float(np.abs(captured["tin"]).max()) > 0.0  # relax actually moved
