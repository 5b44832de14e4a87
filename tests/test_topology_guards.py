"""Host-side topology hazard checks (reference runtime/topology.py:84-199).

Pins the reference's exact collision candidate rule: only projections
falling strictly inside the parameter band 0.05 < t < 0.95 count, and
degenerate edges are skipped.  The clamped-projection variant this replaced
flagged 120 spurious collisions on the converged catenoid lane where the
reference's own run reports none.
"""

import numpy as np

from membrane_solver_tpu.geometry.io_readers import parse_geometry
from membrane_solver_tpu.runtime.topology_guards import detect_vertex_edge_collisions


def _mesh(vertices, edges, faces=None):
    return parse_geometry(
        {"vertices": vertices, "edges": edges, "faces": faces or []}
    )


def test_midspan_collision_detected():
    # vertex 2 sits 1e-4 above the midpoint of edge (0, 1)
    m = _mesh(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 1e-4, 0.0]],
        [[0, 1]],
    )
    cols = detect_vertex_edge_collisions(m)
    assert cols == [(2, 1)]


def test_near_endpoint_not_a_collision():
    # vertex 2 is within threshold of vertex 0's position, but its
    # projection parameter onto edge (0, 1) is ~0.0005 < 0.05: the
    # reference's strict interior band (topology.py:151) excludes it
    m = _mesh(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5e-4, 2e-4, 0.0]],
        [[0, 1]],
    )
    assert detect_vertex_edge_collisions(m) == []


def test_band_boundary_is_strict():
    # projection exactly at t = 0.05 is excluded (strict inequality)
    m = _mesh(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.05, 1e-5, 0.0], [0.0500001, 1e-5, 0.0]],
        [[0, 1]],
    )
    cols = detect_vertex_edge_collisions(m)
    assert (2, 1) not in cols
    assert (3, 1) in cols


def test_degenerate_edge_skipped():
    # edge (0, 1) has zero length (coincident pinned twins); vertex 2 right
    # on top must not register against it (reference topology.py:128-134)
    m = _mesh(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1e-5, 0.0]],
        [[0, 1]],
    )
    assert detect_vertex_edge_collisions(m) == []


def test_own_endpoints_excluded_by_band():
    # an edge's own endpoints project at t=0 and t=1: outside the band
    m = _mesh([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], [[0, 1]])
    assert detect_vertex_edge_collisions(m) == []


def test_threshold_respected():
    m = _mesh(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.01, 0.0]],
        [[0, 1]],
    )
    assert detect_vertex_edge_collisions(m) == []
    assert detect_vertex_edge_collisions(m, threshold=0.02) == [(2, 1)]


def test_min_edge_length():
    m = _mesh(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.25, 0.0]],
        [[0, 1], [0, 2]],
    )
    assert np.isclose(m.min_edge_length(), 0.25)
