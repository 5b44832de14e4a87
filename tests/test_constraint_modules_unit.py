"""Direct unit tests for the smaller geometric/tilt constraint modules.

Covers the modules that previously had only indirect (lane-level) coverage:
global_area, perimeter, fixed_plane, tilt_vector_match_rim,
tilt_thetaB_boundary_in, and the reference's empty placeholders
(fix_vertex_position / fix_facet_angle / edge).
"""

from __future__ import annotations

import numpy as np
import pytest


def _flat_disk_mesh(n_ring=8, radius=1.0, with_tags=None, z_noise=None):
    """Fan disk: center vertex 1 + ring vertices 2..n_ring+1, triangulated."""
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    mesh.vertices[1] = Vertex(1, np.array([0.0, 0.0, 0.0]))
    rng = np.random.default_rng(7)
    for i in range(n_ring):
        ang = 2 * np.pi * i / n_ring
        z = float(z_noise * rng.standard_normal()) if z_noise else 0.0
        mesh.vertices[2 + i] = Vertex(
            2 + i, np.array([radius * np.cos(ang), radius * np.sin(ang), z])
        )
    eid = 1
    spokes, ring = {}, {}
    for i in range(n_ring):
        spokes[i] = eid
        mesh.edges[eid] = Edge(eid, 1, 2 + i)
        eid += 1
    for i in range(n_ring):
        ring[i] = eid
        mesh.edges[eid] = Edge(eid, 2 + i, 2 + (i + 1) % n_ring)
        eid += 1
    for i in range(n_ring):
        mesh.facets[1 + i] = Facet(1 + i, [spokes[i], ring[i], -spokes[(i + 1) % n_ring]])
    if with_tags:
        for vid, opts in with_tags.items():
            mesh.vertices[vid].options.update(opts)
    return mesh


def _problem(mesh, constraints, energies=("surface",), gp=None):
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    if gp:
        mesh.global_parameters.update(gp)
    for c in constraints:
        mesh.constraint_modules.append(c)
    for e in energies:
        mesh.energy_modules.append(e)
    prob = Minimizer(mesh, quiet=True).problem()
    prob.row_map = {int(v): i for i, v in enumerate(prob.vertex_ids)}
    return prob


def _total_area(p):
    pos = np.asarray(p.state.positions)
    tri = np.asarray(p.topo.tri_rows)
    ok = np.asarray(p.topo.tri_valid)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    a = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    return float(a[ok].sum())


def test_global_area_enforce_hits_target():
    from membrane_solver_tpu.runtime import jit_core

    mesh = _flat_disk_mesh()
    p = _problem(mesh, ["global_area"], gp={"target_surface_area": 2.5})
    assert abs(_total_area(p) - 2.5) > 0.1  # starts off-target (~2.83)
    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    assert abs(_total_area(p) - 2.5) < 1e-9


def test_global_area_respects_fixed_vertices():
    from membrane_solver_tpu.runtime import jit_core

    mesh = _flat_disk_mesh()
    mesh.vertices[1].fixed = True
    before = np.asarray(mesh.vertices[1].position).copy()
    p = _problem(mesh, ["global_area"], gp={"target_surface_area": 2.5})
    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    row = p.row_map[1]
    assert np.allclose(np.asarray(p.state.positions)[row], before)


def test_perimeter_enforce_hits_target():
    from membrane_solver_tpu.runtime import jit_core

    mesh = _flat_disk_mesh()
    ring_edges = list(range(9, 17))  # the 8 outer ring edges
    p = _problem(
        mesh,
        ["perimeter"],
        gp={"perimeter_constraints": [{"edges": ring_edges, "target_perimeter": 5.0}]},
    )
    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    pos = np.asarray(p.state.positions)
    total = 0.0
    for i in range(8):
        a = pos[p.row_map[2 + i]]
        b = pos[p.row_map[2 + (i + 1) % 8]]
        total += float(np.linalg.norm(b - a))
    assert abs(total - 5.0) < 1e-8


def test_fixed_plane_projects_movable_only():
    from membrane_solver_tpu.runtime import jit_core

    mesh = _flat_disk_mesh(z_noise=0.3)
    mesh.vertices[3].fixed = True
    z_fixed = float(mesh.vertices[3].position[2])
    assert abs(z_fixed) > 1e-3
    p = _problem(mesh, ["fixed_plane"])
    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    pos = np.asarray(p.state.positions)
    for vid in mesh.vertices:
        z = pos[p.row_map[vid]][2]
        if vid == 3:
            assert abs(z - z_fixed) < 1e-15
        else:
            assert abs(z) < 1e-15


def test_fixed_plane_custom_plane():
    from membrane_solver_tpu.runtime import jit_core

    mesh = _flat_disk_mesh(z_noise=0.2)
    p = _problem(
        mesh,
        ["fixed_plane"],
        gp={"fixed_plane_normal": [0.0, 0.0, 2.0], "fixed_plane_point": [0, 0, 0.5]},
    )
    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    pos = np.asarray(p.state.positions)[: p.n_vertices]
    assert np.abs(pos[:, 2] - 0.5).max() < 1e-15


def _two_ring_tags(n=8):
    """Tag ring vertices: first half 'disk', second half 'rim' (equal counts)."""
    tags = {}
    for i in range(n // 2):
        tags[2 + i] = {"tilt_vector_match_group": "g", "tilt_vector_match_role": "disk"}
    for i in range(n // 2, n):
        tags[2 + i] = {"tilt_vector_match_group": "g", "tilt_vector_match_role": "rim"}
    return tags


def _seed_tilts(mesh, seed=0):
    rng = np.random.default_rng(seed)
    for vid in mesh.vertices:
        t = 0.1 * rng.standard_normal(3)
        t[2] = 0.0
        mesh.vertices[vid].tilt_in = t.copy()
        mesh.vertices[vid].tilt_out = 0.1 * rng.standard_normal(3) * np.array([1, 1, 0])


def _inplane_group_sums(p, rows):
    tin = np.asarray(p.state.tilts_in)
    tout = np.asarray(p.state.tilts_out)
    return (
        tin[rows][:, :2].sum(axis=0),
        tout[rows][:, :2].sum(axis=0),
    )


def test_tilt_vector_match_rim_average_mode():
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    mesh = _flat_disk_mesh(with_tags=_two_ring_tags())
    _seed_tilts(mesh)
    p = _problem(mesh, ["tilt_vector_match_rim"], energies=("tilt_in",),
                 gp={"tilt_modulus_in": 1.0})
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)
    p.state = st
    disk_rows = [p.row_map[2 + i] for i in range(4)]
    rim_rows = [p.row_map[2 + i] for i in range(4, 8)]
    din, dout = _inplane_group_sums(p, disk_rows)
    rin, rout = _inplane_group_sums(p, rim_rows)
    # aggregated in-plane components match between rings, both leaflets
    assert np.abs(din - rin).max() < 1e-12
    assert np.abs(dout - rout).max() < 1e-12
    # idempotent: a second enforcement changes nothing
    st2 = enforce(p.state, p.topo, p.params)
    assert np.abs(np.asarray(st2.tilts_in) - np.asarray(p.state.tilts_in)).max() < 1e-15


def test_tilt_vector_match_rim_rim_to_disk_keeps_rim():
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    mesh = _flat_disk_mesh(with_tags=_two_ring_tags())
    _seed_tilts(mesh, seed=4)
    p = _problem(mesh, ["tilt_vector_match_rim"], energies=("tilt_in",),
                 gp={"tilt_modulus_in": 1.0, "tilt_vector_match_mode": "rim_to_disk"})
    rim_rows = [p.row_map[2 + i] for i in range(4, 8)]
    before = np.asarray(p.state.tilts_in)[rim_rows].copy()
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)
    after = np.asarray(st.tilts_in)[rim_rows]
    assert np.abs(after - before).max() < 1e-15


def test_tilt_thetaB_boundary_enforce_sets_radial_component():
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    tags = {2 + i: {"tilt_thetaB_group": "rim"} for i in range(8)}
    mesh = _flat_disk_mesh(with_tags=tags)
    _seed_tilts(mesh, seed=2)
    p = _problem(
        mesh,
        ["tilt_thetaB_boundary_in"],
        energies=("tilt_in",),
        gp={
            "tilt_modulus_in": 1.0,
            "tilt_thetaB_group_in": "rim",
            "tilt_thetaB_center": [0.0, 0.0, 0.0],
            "tilt_thetaB_normal": [0.0, 0.0, 1.0],
            "tilt_thetaB_value": 0.2,
        },
    )
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)
    tin = np.asarray(st.tilts_in)
    for i in range(8):
        ang = 2 * np.pi * i / 8
        r_hat = np.array([np.cos(ang), np.sin(ang), 0.0])
        row = p.row_map[2 + i]
        assert abs(float(tin[row] @ r_hat) - 0.2) < 1e-12


def test_tilt_thetaB_boundary_kkt_rows_shape_and_direction():
    from membrane_solver_tpu.constraints import tilt_thetaB_boundary_in as mod

    tags = {2 + i: {"tilt_thetaB_group_in": "rim"} for i in range(8)}
    mesh = _flat_disk_mesh(with_tags=tags)
    p = _problem(
        mesh,
        ["tilt_thetaB_boundary_in"],
        energies=("tilt_in",),
        gp={
            "tilt_modulus_in": 1.0,
            "tilt_thetaB_group_in": "rim",
            "tilt_thetaB_normal": [0.0, 0.0, 1.0],
        },
    )
    rows_fn = mod.make_tilt_constraint_rows(p.spec)
    rows = np.asarray(rows_fn(p.state, p.topo, p.params))
    # (k, 2=in/out, Nv, 3): out-leaflet block must be exactly zero
    assert rows.ndim == 4 and rows.shape[1] == 2
    assert np.abs(rows[:, 1]).max() == 0.0
    # each in-leaflet row holds one unit radial direction at one ring row
    norms = np.linalg.norm(rows[:, 0].reshape(rows.shape[0], -1), axis=1)
    valid = norms > 0
    assert valid.sum() == 8
    assert np.abs(norms[valid] - 1.0).max() < 1e-12


def test_placeholder_constraint_modules_match_reference_emptiness():
    """fix_vertex_position / fix_facet_angle / edge are empty placeholders in
    the reference (modules/constraints/*.py) and must stay importable no-ops."""
    import importlib

    for name in ("fix_vertex_position", "fix_facet_angle", "edge"):
        mod = importlib.import_module(f"membrane_solver_tpu.constraints.{name}")
        for hook in ("enforce", "make_enforce", "compile_topology",
                     "make_tilt_constraint_rows", "enforce_tilts"):
            assert not hasattr(mod, hook)
