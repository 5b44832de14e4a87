"""Refinement option/constraint inheritance lanes.

Parity: reference runtime/refinement.py:287-1133 rules — no_refine partial
subdivision, midpoint tilt averaging and fixed-flag AND rule, fixed-edge
midpoints, pin-group inheritance (shared group only), rigid-disk group
inheritance, disk interface tags, and the definitions-drop quirk
(reference refinement.py:1109-1121).
"""

from __future__ import annotations

import numpy as np


def _fan_disk(n_ring=8):
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    mesh.vertices[1] = Vertex(1, np.array([0.0, 0.0, 0.0]))
    for i in range(n_ring):
        ang = 2 * np.pi * i / n_ring
        mesh.vertices[2 + i] = Vertex(2 + i, np.array([np.cos(ang), np.sin(ang), 0.0]))
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
    return mesh


def _refine(mesh):
    from membrane_solver_tpu.runtime.refinement import refine_triangle_mesh

    return refine_triangle_mesh(mesh)


def _midpoint(out, a, b):
    target = 0.5 * (np.asarray(out.vertices[a].position) + np.asarray(out.vertices[b].position))
    for vid, v in out.vertices.items():
        if np.allclose(np.asarray(v.position), target):
            return v
    raise AssertionError(f"no midpoint vertex between {a} and {b}")


def test_no_refine_facet_not_quartered():
    mesh = _fan_disk()
    mesh.facets[1].options["no_refine"] = True
    out = _refine(mesh)
    # full 1->4 on the 7 refinable facets; the no_refine facet splits only
    # along midpoints forced by refinable neighbors (partial cases), never 4
    assert len(out.facets) < 4 * 8
    assert len(out.facets) > 8
    children = [f for f in out.facets.values() if f.options.get("no_refine")]
    assert children and len(children) < 4


def test_midpoint_averages_position_and_tilts():
    mesh = _fan_disk()
    va, vb = mesh.vertices[2], mesh.vertices[3]
    va.tilt_in = np.array([0.2, 0.0, 0.0])
    vb.tilt_in = np.array([0.0, 0.4, 0.0])
    va.tilt_fixed_in = True
    vb.tilt_fixed_in = False
    out = _refine(mesh)
    mid = _midpoint(out, 2, 3)
    assert np.allclose(mid.tilt_in, [0.1, 0.2, 0.0])
    assert mid.tilt_fixed_in is False  # AND rule across endpoints


def test_fixed_edge_midpoint_is_fixed():
    mesh = _fan_disk()
    mesh.edges[9].fixed = True  # ring edge between vertices 2 and 3
    out = _refine(mesh)
    assert _midpoint(out, 2, 3).fixed


def test_pin_to_circle_inherited_only_on_shared_group():
    mesh = _fan_disk()
    for vid in (2, 3):
        mesh.vertices[vid].options.update(
            {"constraints": ["pin_to_circle"], "pin_to_circle_group": "rim",
             "pin_to_circle_radius": 1.0}
        )
    mesh.vertices[4].options.update(
        {"constraints": ["pin_to_circle"], "pin_to_circle_group": "other",
         "pin_to_circle_radius": 1.0}
    )
    out = _refine(mesh)
    shared = _midpoint(out, 2, 3)
    assert shared.options.get("pin_to_circle_group") == "rim"
    assert "pin_to_circle" in (shared.options.get("constraints") or [])
    mixed = _midpoint(out, 3, 4)  # rim vs other: groups conflict -> no pin
    assert mixed.options.get("pin_to_circle_group") is None


def test_rigid_disk_group_inherited_on_equal_groups_only():
    mesh = _fan_disk()
    mesh.vertices[2].options["rigid_disk_group"] = "d"
    mesh.vertices[3].options["rigid_disk_group"] = "d"
    mesh.vertices[4].options["rigid_disk_group"] = "e"
    out = _refine(mesh)
    assert _midpoint(out, 2, 3).options.get("rigid_disk_group") == "d"
    assert _midpoint(out, 3, 4).options.get("rigid_disk_group") is None


def test_disk_interface_tags_inherited():
    mesh = _fan_disk()
    for vid in (2, 3):
        mesh.vertices[vid].options["rim_slope_match_group"] = "disk"
    out = _refine(mesh)
    mid = _midpoint(out, 2, 3)
    assert mid.options.get("rim_slope_match_group") == "disk"
    assert mid.options.get("tilt_thetaB_group_in") == "disk"


def test_definitions_dropped_but_preset_names_kept():
    """Reference quirk: refine_triangle_mesh does not carry `definitions`
    to the refined mesh; preset names survive, defaults resolve only on the
    first refinement after load (reference refinement.py:1109-1121)."""
    mesh = _fan_disk()
    mesh.definitions = {"rim": {"fixed": True}}
    for vid in (2, 3):
        mesh.vertices[vid].options["preset"] = "rim"
    out = _refine(mesh)
    assert out.definitions == {}
    mid = _midpoint(out, 2, 3)
    assert mid.options.get("preset") == "rim"
    assert mid.fixed  # first refinement still applied the definition default
    # a second refinement keeps the name but can no longer resolve defaults
    out2 = _refine(out)
    assert out2.definitions == {}
