"""Padded-scatter regression pins (round-4 parity bugs).

Compiled constraint/energy row tables pad to a power of two with row 0 as
the fill value.  A plain ``positions.at[rows].set(...)`` therefore lets a
LATER padding entry overwrite vertex row 0's projected position (or clear
its disk membership) with stale data — scatter-with-set resolves duplicate
indices to the last write.  On the kozlov lanes the disk-center vertex IS
row 0, so its pin_to_plane slide projection was silently undone after
every mesh op and line-search trial (6e-5 position error, 7.5e-3 lane
energy drift on the i50 physical-edge lane).

These tests construct tables WITH padding (5 pinned vertices pad to 8)
and assert row 0 is projected like every other row.  Fixed by routing
invalid entries to a drop index (``mode="drop"``) in
constraints/pin_to_plane.py, constraints/pin_to_circle.py, and
energy/_disk_target.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry


def _cube_mesh():
    mesh = parse_geometry(load_data("meshes/cube.json"))
    return mesh


def test_pin_to_plane_slide_projects_vertex_row_zero():
    mesh = _cube_mesh()
    # 5 pinned vertices -> table pads to 8 with 3 padding entries at row 0
    for vid in range(5):
        v = mesh.vertices[vid]
        opts = dict(v.options or {})
        opts["constraints"] = list(opts.get("constraints") or []) + ["pin_to_plane"]
        opts["pin_to_plane_mode"] = "slide"
        opts["pin_to_plane_group"] = "padtest"
        opts["pin_to_plane_normal"] = [0.0, 0.0, 1.0]
        v.options = opts
    mesh.constraint_modules = list(
        dict.fromkeys(list(mesh.constraint_modules) + ["pin_to_plane"])
    )
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()

    from membrane_solver_tpu.constraints import pin_to_plane as ptp

    zs = np.asarray(p.state.positions)[:5, 2]
    mean_z = float(np.mean(zs))
    st2 = ptp.enforce(p.state, p.topo, p.params, context="mesh_operation")
    out = np.asarray(st2.positions)
    # every pinned row (INCLUDING row 0) slides onto the group's mean plane
    for row in range(5):
        assert out[row, 2] == pytest.approx(mean_z, abs=1e-12), row
    # unpinned rows untouched
    assert np.allclose(out[5:8], np.asarray(p.state.positions)[5:8])


def test_pin_to_circle_projects_vertex_row_zero():
    mesh = _cube_mesh()
    for vid in range(5):
        v = mesh.vertices[vid]
        opts = dict(v.options or {})
        opts["constraints"] = list(opts.get("constraints") or []) + ["pin_to_circle"]
        opts["pin_to_circle_group"] = "padtest"
        opts["pin_to_circle_radius"] = 2.0
        opts["pin_to_circle_normal"] = [0.0, 0.0, 1.0]
        opts["pin_to_circle_point"] = [0.0, 0.0, 0.0]
        opts["pin_to_circle_mode"] = "fixed"
        v.options = opts
    mesh.constraint_modules = list(
        dict.fromkeys(list(mesh.constraint_modules) + ["pin_to_circle"])
    )
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()

    from membrane_solver_tpu.constraints import pin_to_circle as ptc

    st2 = ptc.enforce(p.state, p.topo, p.params, context="mesh_operation")
    out = np.asarray(st2.positions)
    for row in range(5):
        r = float(np.hypot(out[row, 0], out[row, 1]))
        assert r == pytest.approx(2.0, abs=1e-12), (row, r)


def test_disk_target_keeps_row_zero_membership():
    mesh = _cube_mesh()
    for vid in range(5):
        v = mesh.vertices[vid]
        opts = dict(v.options or {})
        opts["tilt_disk_target_group_in"] = "padtest"
        v.options = opts
    mesh.global_parameters.update(
        {
            "tilt_disk_target_group_in": "padtest",
            "tilt_disk_target_strength_in": 1.0,
            "tilt_disk_target_theta_B_in": 0.3,
            "tilt_modulus_in": 1.0,
        }
    )
    mesh.energy_modules = list(
        dict.fromkeys(list(mesh.energy_modules) + ["tilt_disk_target_in"])
    )
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()

    import dataclasses

    import jax.numpy as jnp

    from membrane_solver_tpu.runtime import jit_core

    total = jit_core.make_total_energy(p.spec)
    E0 = float(total(p.state, p.topo, p.params))
    # perturb ONLY row 0's in-tilt: if row 0 kept its disk membership the
    # target penalty must change the energy; with the padding bug the
    # membership flag was cleared and the perturbation was free
    tin = jnp.asarray(p.state.tilts_in).at[0].set(jnp.asarray([5.0, 0.0, 0.0]))
    st2 = dataclasses.replace(p.state, tilts_in=tin)
    E1 = float(total(st2, p.topo, p.params))
    assert E1 > E0 + 1.0, (E0, E1)
