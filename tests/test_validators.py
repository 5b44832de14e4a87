"""Topology validator lanes (runtime/validation.py).

Parity: reference runtime/interface_validation.py:21-172,
runtime/leaflet_validation.py:22-87, and
modules/energy/gaussian_curvature.py:145-173 strict-topology checks.
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import load_data, parse_geometry
from membrane_solver_tpu.runtime.validation import (
    validate_disk_interface_topology,
    validate_gaussian_curvature_topology,
    validate_leaflet_absence_topology,
)


def _cube():
    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    return mesh


def test_leaflet_absence_rejects_straddling_triangles():
    mesh = _cube()
    # tag a single vertex absent: every incident triangle straddles
    vid = sorted(mesh.vertices)[0]
    mesh.vertices[vid].options["preset"] = "ghost"
    gp = mesh.global_parameters
    gp.update({"leaflet_out_absent_presets": ["ghost"]})
    with pytest.raises(ValueError, match="straddle"):
        validate_leaflet_absence_topology(mesh, gp)
    # triangle-mode (facet-based absence) skips the strict vertex check
    gp.update({"leaflet_out_absence_mode": "triangles"})
    validate_leaflet_absence_topology(mesh, gp)


def test_leaflet_absence_passes_without_tags():
    mesh = _cube()
    validate_leaflet_absence_topology(mesh, mesh.global_parameters)


def test_gaussian_strict_topology_accepts_closed_cube():
    mesh = _cube()
    gp = mesh.global_parameters
    gp.update(
        {
            "gaussian_curvature_check_defects": True,
            "gaussian_curvature_strict_topology": True,
        }
    )
    validate_gaussian_curvature_topology(mesh, gp)  # chi=2, defects = 4*pi


def test_gaussian_strict_topology_rejects_non_manifold():
    from membrane_solver_tpu.geometry.entities import Edge, Facet, Vertex

    mesh = _cube()
    # graft a dangling triangle onto an existing edge -> that edge now has
    # three incident facets (non-manifold)
    eid0 = sorted(mesh.edges)[0]
    e0 = mesh.edges[eid0]
    new_vid = max(mesh.vertices) + 1
    mesh.vertices[new_vid] = Vertex(
        new_vid, np.asarray(mesh.vertices[e0.tail_index].position) + [0.3, 0.3, 0.9]
    )
    e1 = max(mesh.edges) + 1
    e2 = e1 + 1
    mesh.edges[e1] = Edge(e1, e0.head_index, new_vid)
    mesh.edges[e2] = Edge(e2, new_vid, e0.tail_index)
    fid = max(mesh.facets) + 1
    mesh.facets[fid] = Facet(fid, [eid0, e1, e2])
    mesh.build_connectivity_maps(force=True)
    gp = mesh.global_parameters
    gp.update({"gaussian_curvature_strict_topology": True})
    with pytest.raises(ValueError, match="non-manifold"):
        validate_gaussian_curvature_topology(mesh, gp)


def test_disk_interface_rejects_self_coupled_groups():
    mesh = _cube()
    gp = mesh.global_parameters
    gp.update(
        {
            "disk_interface_validate": True,
            "rim_slope_match_disk_group": "disk",
            "rim_slope_match_group": "disk",
        }
    )
    with pytest.raises(ValueError, match="self-couples"):
        validate_disk_interface_topology(mesh, gp)


def test_disk_interface_passes_when_off_or_untagged():
    mesh = _cube()
    gp = mesh.global_parameters
    validate_disk_interface_topology(mesh, gp)  # validation off
    gp.update(
        {
            "disk_interface_validate": True,
            "rim_slope_match_disk_group": "disk",
            "rim_slope_match_group": "rim",
        }
    )
    validate_disk_interface_topology(mesh, gp)  # no tagged vertices: no-op
