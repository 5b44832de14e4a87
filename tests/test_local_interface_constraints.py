"""Unit tests for the local-interface shell family: shell-row construction
(local_interface_shells), the ring-averaged hard constraint
(curved_local_interface_hard), and the tilt vector matching constraint
(curved_local_interface_match).

Parity: reference modules/constraints/{local_interface_shells,
curved_local_interface_hard,curved_local_interface_match}.py; the lanes that
exercise these in anger are the physical-edge acceptance lanes — these tests
pin the module semantics on a synthetic three-shell annulus instead.
"""

from __future__ import annotations

import numpy as np


def _annulus_mesh(n=8, radii=(0.8, 1.0, 1.2), zs=(0.0, 0.0, 0.1)):
    """Three concentric rings, triangulated bands between them.

    Inner ring tagged as the disk-boundary group 'disk'.
    """
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    rings = []
    vid = 1
    for r, z in zip(radii, zs):
        ring = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            mesh.vertices[vid] = Vertex(
                vid, np.array([r * np.cos(ang), r * np.sin(ang), z])
            )
            ring.append(vid)
            vid += 1
        rings.append(ring)

    edge_of = {}
    eid_counter = [1]

    def e(u, v):
        if (u, v) in edge_of:
            return edge_of[(u, v)]
        if (v, u) in edge_of:
            return -edge_of[(v, u)]
        eid = eid_counter[0]
        eid_counter[0] += 1
        mesh.edges[eid] = Edge(eid, u, v)
        edge_of[(u, v)] = eid
        return eid

    fid = 1
    for a_ring, b_ring in zip(rings[:-1], rings[1:]):
        for j in range(n):
            a, a2 = a_ring[j], a_ring[(j + 1) % n]
            b, b2 = b_ring[j], b_ring[(j + 1) % n]
            mesh.facets[fid] = Facet(fid, [e(a, a2), e(a2, b2), e(b2, a)])
            fid += 1
            mesh.facets[fid] = Facet(fid, [e(a, b2), e(b2, b), e(b, a)])
            fid += 1
    for v in rings[0]:
        mesh.vertices[v].options["rim_slope_match_group"] = "disk"
    return mesh, rings


def _problem(mesh, constraints, gp=None):
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    mesh.global_parameters.update(gp or {})
    for c in constraints:
        mesh.constraint_modules.append(c)
    mesh.energy_modules.append("tilt_out")
    mesh.global_parameters.update({"tilt_modulus_out": 1.0})
    prob = Minimizer(mesh, quiet=True).problem()
    prob.row_map = {int(v): i for i, v in enumerate(prob.vertex_ids)}
    return prob


def test_build_shell_rows_identifies_three_shells():
    from membrane_solver_tpu.device.state import compile_state
    from membrane_solver_tpu.constraints.local_interface_shells import build_shell_rows

    mesh, rings = _annulus_mesh()
    mesh.energy_modules.append("surface")
    p = compile_state(mesh)
    row_map = {int(v): i for i, v in enumerate(p.vertex_ids)}

    # rebuild the layout the way spec compilation does
    from membrane_solver_tpu.device import state as dstate

    layout = dstate.CompileLayout(
        mesh=mesh,
        vertex_ids=p.vertex_ids,
        row_of=row_map,
        edge_ids=[], edge_slot_of={}, tri_facet_ids=[], tri_slot_of={},
        body_ids=[], body_slot_of={},
        nv_cap=p.state.positions.shape[0], nf_cap=0, ne_cap=0, nb_cap=0,
    )
    shells = build_shell_rows(layout)
    assert shells is not None
    assert abs(shells.disk_radius - 0.8) < 1e-12
    assert abs(shells.rim_radius - 1.0) < 1e-12
    assert abs(shells.outer_radius - 1.2) < 1e-12
    assert sorted(shells.disk_rows) == sorted(row_map[v] for v in rings[0])
    assert sorted(shells.rim_rows) == sorted(row_map[v] for v in rings[1])
    assert sorted(shells.outer_rows) == sorted(row_map[v] for v in rings[2])
    # azimuth matching on equal counts preserves the ring order cyclically
    assert len(shells.rim_rows_matched) == len(shells.outer_rows)


def test_curved_local_interface_hard_enforce_zeroes_mean_residual():
    import dataclasses

    from membrane_solver_tpu.constraints import curved_local_interface_hard as mod
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    mesh, rings = _annulus_mesh()
    rng = np.random.default_rng(1)
    for v in rings[1]:
        mesh.vertices[v].tilt_out = 0.2 * rng.standard_normal(3) * np.array([1, 1, 0])
    p = _problem(mesh, ["curved_local_interface_hard"])
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)

    rim_rows, r_dir, phi, ok = mod._matching(st.positions, p.topo)
    rim_rows = np.asarray(rim_rows)
    r_dir, phi, ok = np.asarray(r_dir), np.asarray(phi), np.asarray(ok)
    t_out = np.asarray(st.tilts_out)
    residual = (t_out[rim_rows] * r_dir).sum(axis=1) - phi
    assert ok.sum() == 8
    assert abs(residual[ok].mean()) < 1e-12
    # the slope target phi = dz/dr = 0.1 / 0.2 on every matched pair
    assert np.abs(phi[ok] - 0.5).max() < 1e-12
    # idempotent
    st2 = enforce(st, p.topo, p.params)
    assert np.abs(np.asarray(st2.tilts_out) - t_out).max() < 1e-14


def test_curved_local_interface_hard_kkt_row_structure():
    from membrane_solver_tpu.constraints import curved_local_interface_hard as mod

    mesh, rings = _annulus_mesh()
    p = _problem(mesh, ["curved_local_interface_hard"])
    rows_fn = mod.make_tilt_constraint_rows(p.spec)
    rows = np.asarray(rows_fn(p.state, p.topo, p.params))
    assert rows.shape[0] == 1 and rows.shape[1] == 2  # one row, in/out blocks
    assert np.abs(rows[0, 0]).max() == 0.0  # inner-leaflet block zero
    gout = rows[0, 1]
    nz = np.flatnonzero(np.linalg.norm(gout, axis=1) > 0)
    assert sorted(nz) == sorted(
        p.row_map[v] for v in rings[1]
    )  # exactly the rim-shell rows
    # rows carry r_dir / n_valid: total weight sums to ~1 radially
    assert abs(np.linalg.norm(gout, axis=1).sum() - 1.0) < 1e-9


def test_curved_local_interface_match_vector_average():
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    # flat annulus: pair tangent bases are exactly in-plane, so the
    # pair-matched (u, v) coefficients are directly comparable in xy
    mesh, rings = _annulus_mesh(zs=(0.0, 0.0, 0.0))
    rng = np.random.default_rng(5)
    for v in rings[0] + rings[1]:
        mesh.vertices[v].tilt_in = 0.15 * rng.standard_normal(3) * np.array([1, 1, 0])
        mesh.vertices[v].tilt_out = 0.15 * rng.standard_normal(3) * np.array([1, 1, 0])
    p = _problem(
        mesh,
        ["curved_local_interface_match"],
        gp={"curved_local_interface_match_mode": "vector_average", "tilt_modulus_in": 1.0},
    )
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)
    # second application is a fixed point
    st2 = enforce(st, p.topo, p.params)
    assert np.abs(np.asarray(st2.tilts_in) - np.asarray(st.tilts_in)).max() < 1e-12
    assert np.abs(np.asarray(st2.tilts_out) - np.asarray(st.tilts_out)).max() < 1e-12
    # pairing snapped rim and disk in-plane tilts together: aggregated
    # in-plane sums agree between the two rings for both leaflets
    disk_rows = [p.row_map[v] for v in rings[0]]
    rim_rows = [p.row_map[v] for v in rings[1]]
    for tilts in (np.asarray(st.tilts_in), np.asarray(st.tilts_out)):
        d = tilts[disk_rows][:, :2].sum(axis=0)
        r = tilts[rim_rows][:, :2].sum(axis=0)
        assert np.abs(d - r).max() < 1e-9
