"""The per-iteration module scalar-update hook (legacy theta_B closed form).

Parity: reference runtime/minimizer.py:1221 calls _update_scalar_params at
the start of every iteration; the only shipping hook is the legacy
quadratic-penalty closed-form theta_B update in
modules/energy/tilt_thetaB_contact_in.py (opt-in via
tilt_thetaB_contact_penalty_mode: legacy — _penalty_mode defaults "off"),
and it is skipped when theta_B is globally optimized
(reference minimizer.py:1121-1136).
"""

from __future__ import annotations

import numpy as np


def _disk_lane(penalty_mode="legacy", thetaB_optimize=False):
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    mesh = Mesh()
    mesh.vertices[1] = Vertex(1, np.array([0.0, 0.0, 0.0]), fixed=True)
    n = 8
    rng = np.random.default_rng(0)
    for i in range(n):
        ang = 2 * np.pi * i / n
        v = Vertex(i + 2, np.array([np.cos(ang), np.sin(ang), 0.0]), fixed=True)
        v.options["tilt_thetaB_group"] = "disk"
        t = 0.1 * rng.standard_normal(3)
        t[2] = 0.0
        v.tilt_in = t
        mesh.vertices[i + 2] = v
    eid = 1
    spokes, ring = {}, {}
    for i in range(n):
        spokes[i] = eid
        mesh.edges[eid] = Edge(eid, 1, 2 + i)
        eid += 1
    for i in range(n):
        ring[i] = eid
        mesh.edges[eid] = Edge(eid, 2 + i, 2 + (i + 1) % n)
        eid += 1
    for i in range(n):
        mesh.facets[1 + i] = Facet(1 + i, [spokes[i], ring[i], -spokes[(i + 1) % n]])
    mesh.global_parameters.update(
        {
            "tilt_thetaB_group_in": "disk",
            "tilt_thetaB_center": [0.0, 0.0, 0.0],
            "tilt_thetaB_normal": [0.0, 0.0, 1.0],
            "tilt_thetaB_value": 0.3,
            "tilt_thetaB_strength_in": 100.0,
            "tilt_thetaB_contact_strength_in": 4.286,
            "tilt_thetaB_contact_penalty_mode": penalty_mode,
            "tilt_thetaB_optimize": thetaB_optimize,
            "tilt_solve_mode": "fixed",  # tilts constant: the update is a fixed map
            "surface_tension": 1.0,
        }
    )
    mesh.energy_modules.extend(["surface", "tilt_in", "tilt_thetaB_contact_in"])
    mesh.global_parameters.update({"tilt_modulus_in": 1.0})
    return Minimizer(mesh, quiet=True)


def test_legacy_closed_form_update_runs_each_iteration():
    from membrane_solver_tpu.energy import tilt_thetaB_contact_in as mod

    mn = _disk_lane()
    # expected value: the module's own closed form on the entry tilts
    probe = _disk_lane()
    mod.update_scalar_params(probe.mesh, probe.mesh.global_parameters, probe.param_resolver)
    expected = float(probe.mesh.global_parameters.get("tilt_thetaB_value"))
    assert abs(expected - 0.3) > 1e-6  # the update genuinely moves theta

    mn.minimize(2)
    got = float(mn.global_params.get("tilt_thetaB_value"))
    # tilts are frozen (tilt_solve_mode fixed, all vertices fixed), so every
    # iteration's update lands on the same closed-form value
    assert abs(got - expected) < 1e-12


def test_update_inactive_outside_legacy_mode():
    mn = _disk_lane(penalty_mode="off")
    mn.minimize(2)
    assert float(mn.global_params.get("tilt_thetaB_value")) == 0.3


def test_update_skipped_when_thetaB_globally_optimized():
    mn = _disk_lane(thetaB_optimize=True)
    # no scan parameters set -> the scan itself cannot move theta either
    mn.global_params.update({"tilt_thetaB_optimize_delta": 0.0})
    mn.minimize(2)
    assert float(mn.global_params.get("tilt_thetaB_value")) == 0.3


def test_scalar_update_live_predicate():
    from membrane_solver_tpu.energy import tilt_thetaB_contact_in as mod

    mn = _disk_lane()
    assert mod.scalar_update_live(mn.mesh, mn.global_params)
    mn.global_params.update({"tilt_thetaB_contact_penalty_mode": "off"})
    assert not mod.scalar_update_live(mn.mesh, mn.global_params)
    mn.global_params.update(
        {"tilt_thetaB_contact_penalty_mode": "legacy", "tilt_thetaB_strength_in": 0.0}
    )
    assert not mod.scalar_update_live(mn.mesh, mn.global_params)
