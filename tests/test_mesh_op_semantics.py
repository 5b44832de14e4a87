"""Behavioral lanes for equiangulation and vertex averaging semantics.

Parity: reference runtime/equiangulation.py (Delaunay opposite-angle
criterion, fixed edges never flipped, flip revert on inverted normals)
and runtime/vertex_average.py (w^2 incident-area weights, fixed and
pin_to_circle vertices skipped).
"""

from __future__ import annotations

import numpy as np


def _two_triangle_quad(skew=0.0):
    """Two triangles sharing a diagonal chosen to be non-Delaunay.

    Vertices: a thin rhombus (0,0) (0.5,-0.1) (1,0) (0.5,0.1); the shared
    diagonal 1-3 is the LONG one, so the angles opposite it (at the two thin
    corners 2 and 4) sum well past pi and Delaunay wants the 2-4 diagonal.
    """
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    pts = [(0.0, 0.0), (0.5, -0.1 - skew), (1.0, 0.0), (0.5, 0.1)]
    for i, (x, y) in enumerate(pts, start=1):
        mesh.vertices[i] = Vertex(i, np.array([x, y, 0.0]))
    # edges: 1-2, 2-3, 3-4, 4-1, diagonal 1-3 (long diagonal of the thin quad)
    for eid, (t, h) in enumerate(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], start=1
    ):
        mesh.edges[eid] = Edge(eid, t, h)
    mesh.facets[1] = Facet(1, [1, 2, -5])  # 1-2-3
    mesh.facets[2] = Facet(2, [5, 3, 4])  # 1-3-4
    return mesh


def test_should_flip_long_diagonal():
    from membrane_solver_tpu.runtime.equiangulation import should_flip_edge

    mesh = _two_triangle_quad()
    flip = should_flip_edge(
        mesh, mesh.edges[5], mesh.facets[1], mesh.facets[2]
    )
    assert flip  # opposite angles at vertices 2 and 4 sum past pi


def test_equiangulate_flips_to_delaunay_fixed_point():
    from membrane_solver_tpu.runtime.equiangulation import (
        equiangulate_mesh,
        should_flip_edge,
    )

    mesh = _two_triangle_quad()
    out = equiangulate_mesh(mesh)
    assert len(out.facets) == 2 and len(out.edges) == 5
    # the diagonal now connects vertices 2 and 4
    diag = [e for e in out.edges.values()
            if {e.tail_index, e.head_index} == {2, 4}]
    assert len(diag) == 1
    # converged: no edge wants to flip anymore
    out.build_connectivity_maps(force=True)
    for e in out.edges.values():
        fs = [out.facets[f] for f in out.edge_to_facets.get(e.index, ())]
        if len(fs) == 2:
            assert not should_flip_edge(out, e, fs[0], fs[1])
    # total area preserved by the flip
    def area(m):
        m.build_connectivity_maps(force=True)
        tot = 0.0
        for f in m.facets.values():
            loop = m.facet_vertex_loop(f)
            p = [np.asarray(m.vertices[v].position) for v in loop]
            tot += 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
        return tot
    assert abs(area(out) - area(_two_triangle_quad())) < 1e-12


def test_fixed_edge_never_flipped():
    from membrane_solver_tpu.runtime.equiangulation import equiangulate_mesh

    mesh = _two_triangle_quad()
    mesh.edges[5].fixed = True
    out = equiangulate_mesh(mesh)
    diag = [e for e in out.edges.values()
            if {e.tail_index, e.head_index} == {1, 3}]
    assert len(diag) == 1  # kept despite failing the Delaunay criterion


def test_vertex_average_skips_fixed_and_pinned():
    from membrane_solver_tpu.runtime.vertex_average import vertex_average
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    mesh.vertices[1] = Vertex(1, np.array([0.2, 0.1, 0.0]))  # off-center hub
    n = 6
    for i in range(n):
        ang = 2 * np.pi * i / n
        mesh.vertices[2 + i] = Vertex(2 + i, np.array([np.cos(ang), np.sin(ang), 0.0]))
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
    for i in range(n):
        mesh.vertices[2 + i].fixed = True

    before_hub = np.asarray(mesh.vertices[1].position).copy()
    ring_before = [np.asarray(mesh.vertices[2 + i].position).copy() for i in range(n)]
    vertex_average(mesh)
    after_hub = np.asarray(mesh.vertices[1].position)
    # hub moved toward the ring centroid (0, 0)
    assert np.linalg.norm(after_hub[:2]) < np.linalg.norm(before_hub[:2])
    for i in range(n):  # fixed ring untouched
        assert np.allclose(mesh.vertices[2 + i].position, ring_before[i])

    # a pinned hub must not move
    mesh2 = Mesh()
    mesh2.vertices = {k: v.copy() for k, v in mesh.vertices.items()}
    mesh2.edges = mesh.edges
    mesh2.facets = mesh.facets
    mesh2.vertices[1].fixed = False
    mesh2.vertices[1].options["constraints"] = ["pin_to_circle"]
    mesh2.vertices[1].options["pin_to_circle_group"] = "rim"
    hub = np.asarray(mesh2.vertices[1].position).copy()
    vertex_average(mesh2)
    assert np.allclose(mesh2.vertices[1].position, hub)
