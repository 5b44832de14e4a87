"""Mesh-operation invariants (SURVEY 4: refinement/equiangulation lanes).

Parity: reference tests/test_refinement.py,
test_refinement_preserves_presets.py, test_topology_invariants_regression.py,
test_equiangulation.py, test_vertex_average_evolver_compat.py.
"""

from __future__ import annotations

import numpy as np

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.runtime.equiangulation import equiangulate_iteration
from membrane_solver_tpu.runtime.refinement import (
    refine_polygonal_facets,
    refine_triangle_mesh,
)
from membrane_solver_tpu.runtime.vertex_average import vertex_average


def _euler(mesh):
    return len(mesh.vertices) - len(mesh.edges) + len(mesh.facets)


def test_refine_quadruples_triangles_and_keeps_euler():
    mesh = parse_geometry(build("cube"))
    mesh = refine_polygonal_facets(mesh)
    chi0, f0 = _euler(mesh), len(mesh.facets)
    out = refine_triangle_mesh(mesh)
    assert len(out.facets) == 4 * f0
    assert _euler(out) == chi0  # closed surface: chi invariant


def test_refine_preserves_presets_and_fixed():
    mesh = parse_geometry(build("kozlov_1disk"))
    rim_before = {
        vid for vid, v in mesh.vertices.items()
        if str((v.options or {}).get("preset") or "") == "rim"
    }
    out = refine_triangle_mesh(refine_polygonal_facets(mesh))
    rim_after = {
        vid for vid, v in out.vertices.items()
        if str((v.options or {}).get("preset") or "") == "rim"
    }
    # original rim vertices keep their preset; rim grows with midpoints
    assert rim_before <= rim_after
    assert len(rim_after) > len(rim_before)
    fixed_after = [vid for vid, v in out.vertices.items() if v.fixed]
    assert fixed_after, "fixed far-ring flags must survive refinement"


def test_refined_mesh_minimizes():
    mesh = parse_geometry(build("cube"))
    mesh = refine_triangle_mesh(refine_polygonal_facets(mesh))
    mn = Minimizer(mesh, quiet=True)
    e0 = float(mn.compute_energy())
    mn.minimize(5)
    assert float(mn.compute_energy()) < e0


def test_equiangulation_preserves_counts_and_area():
    mesh = parse_geometry(build("cube"))
    mesh = refine_triangle_mesh(refine_polygonal_facets(mesh))
    mn = Minimizer(mesh, quiet=True)
    mn.minimize(10)
    mn._sync_host()
    mesh = mn.mesh
    nv, ne, nf = len(mesh.vertices), len(mesh.edges), len(mesh.facets)
    area0 = mesh.compute_total_surface_area()
    out, flips = equiangulate_iteration(mesh)
    assert (len(out.vertices), len(out.edges), len(out.facets)) == (nv, ne, nf)
    assert out.compute_total_surface_area() < area0 + 1e-9  # Delaunay flips shrink area


def test_vertex_average_keeps_boundary_and_volume():
    mesh = parse_geometry(build("cube"))
    mn = Minimizer(mesh, quiet=True)
    mn.minimize(5)
    mn._sync_host()
    mesh = mn.mesh
    vol0 = mesh.compute_total_volume()
    vertex_average(mesh)
    vol1 = mesh.compute_total_volume()
    # area-weighted averaging smooths without collapsing the shell (the
    # coarse 14-vertex cube moves noticeably; the invariant is sanity, not
    # exact conservation — the reference's volume restoration happens in
    # the subsequent constraint enforcement, not inside vertex_average)
    assert abs(vol1 - vol0) / max(abs(vol0), 1e-12) < 0.35
    assert mesh.compute_total_surface_area() > 0.0
