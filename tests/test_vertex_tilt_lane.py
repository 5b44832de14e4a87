"""Single-field (vertex tilt) lane: nested relaxation + shape steps.

Lane: reference meshes/tilt_benchmarks/tilt_source_rect.yaml — a 3x3 strip
with tilt sources [+1,0,0] / [-1,0,0] pinned on the short edges, energy =
tilt_smoothness (Dirichlet) + tilt (magnitude), surface_tension 0, nested
tilt solve.  The middle column's zero tilt is already the constrained
optimum (symmetric sources), so descent comes from shape steps; the nested
single-field relaxation must leave the stationary tilts alone.

Reference values (recorded 2026-08-16): E0 = 1.05 exactly; after g3 the
reference reaches 1.049875806142507 — ours must stay within 1e-8 of it.
"""

from __future__ import annotations

import numpy as np


def test_tilt_source_rect_lane():
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    mesh = parse_geometry(
        load_data("/root/reference/meshes/tilt_benchmarks/tilt_source_rect.yaml")
    )
    mn = Minimizer(mesh, quiet=True)
    assert abs(mn.compute_energy() - 1.05) < 1e-12

    p = mn.problem()
    tilts_before = np.asarray(p.state.tilts).copy()
    mn.minimize(3)
    E = mn.compute_energy()
    assert abs(E - 1.049875806142507) < 1e-8

    # the stationary tilts only drift once shape steps move the geometry
    # (the reference behaves identically: zero tilt change through g1);
    # after g3 the nested relaxation has tracked the slightly moved mesh
    p = mn.problem()
    tilts_after = np.asarray(p.state.tilts)
    nv = p.n_vertices
    assert np.abs(tilts_after[:nv] - tilts_before[:nv]).max() < 1e-3
