"""Save/load round-trip: full state survives serialization.

Parity: reference tests/test_save_geometry_roundtrip.py,
test_save_geometry_preserves_modules.py, test_geom_io_tilts.py — positions,
per-leaflet tilts, options, module lists, global parameters, macros, and
presets all round-trip through save_geometry/parse_geometry (the
checkpoint/resume surface, SURVEY 5.4).
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry, save_geometry
from membrane_solver_tpu.meshgen import build


def _roundtrip(mesh, tmp_path):
    path = tmp_path / "rt.json"
    save_geometry(mesh, path)
    return parse_geometry(load_data(path))


def test_positions_and_tilts_roundtrip(tmp_path):
    mesh = parse_geometry(build("kozlov_1disk"))
    mn = Minimizer(mesh, quiet=True)
    mn.minimize(2)  # develop nonzero tilts
    mn._sync_host()

    back = _roundtrip(mesh, tmp_path)
    assert sorted(back.vertices) == sorted(mesh.vertices)
    for vid in mesh.vertices:
        np.testing.assert_allclose(
            back.vertices[vid].position, mesh.vertices[vid].position, atol=0
        )
        np.testing.assert_allclose(
            back.vertices[vid].tilt_in, mesh.vertices[vid].tilt_in, atol=0
        )
        np.testing.assert_allclose(
            back.vertices[vid].tilt_out, mesh.vertices[vid].tilt_out, atol=0
        )


def test_modules_params_macros_roundtrip(tmp_path):
    mesh = parse_geometry(build("kozlov_1disk"))
    back = _roundtrip(mesh, tmp_path)
    assert list(back.energy_modules) == list(mesh.energy_modules)
    assert list(back.constraint_modules) == list(mesh.constraint_modules)
    for key in ("tilt_modulus_in", "tilt_thetaB_value", "tilt_solve_mode"):
        assert back.global_parameters.get(key) == mesh.global_parameters.get(key)
    assert dict(getattr(back, "macros", {}) or {}) == dict(getattr(mesh, "macros", {}) or {})


def test_resume_equals_continue(tmp_path):
    """Checkpoint mid-run, reload, continue: same final energy as uninterrupted.

    Fixed-step GD so the only non-checkpointed optimizer state (the adaptive
    step size — not checkpointed in the reference either) plays no role.
    """

    def fresh():
        data = build("cube")
        data["global_parameters"].update({"step_size_mode": "fixed", "step_size": 0.02})
        return parse_geometry(data)

    mn_a = Minimizer(fresh(), quiet=True)
    mn_a.minimize(10)
    mn_a.minimize(5)
    e_straight_5more = float(mn_a.compute_energy())

    mesh_b = fresh()
    mn_b = Minimizer(mesh_b, quiet=True)
    mn_b.minimize(10)
    mn_b._sync_host()
    path = tmp_path / "ckpt.json"
    save_geometry(mesh_b, path)
    mesh_c = parse_geometry(load_data(path))
    mn_c = Minimizer(mesh_c, quiet=True)
    mn_c.minimize(5)
    assert abs(float(mn_c.compute_energy()) - e_straight_5more) < 1e-10


def test_explicit_id_forms_roundtrip(tmp_path):
    """Explicit-ID dict forms for vertices/edges/faces parse and round-trip
    (reference io_readers list-or-dict duality)."""
    data = {
        "vertices": {"10": [0, 0, 0], "11": [1, 0, 0], "12": [0, 1, 0]},
        "edges": {"5": [10, 11], "6": [11, 12], "7": [12, 10]},
        "faces": {"3": [5, 6, 7]},
        "energy_modules": ["surface"],
        "global_parameters": {"surface_tension": 2.0},
    }
    mesh = parse_geometry(data)
    assert set(mesh.vertices) == {10, 11, 12}
    assert set(mesh.facets) == {3}
    path = tmp_path / "explicit.json"
    save_geometry(mesh, str(path))
    mesh2 = parse_geometry(load_data(str(path)))
    assert set(mesh2.vertices) == set(mesh.vertices)
    mn = Minimizer(mesh2, quiet=True)
    e = float(mn.compute_energy())
    assert e == pytest.approx(2.0 * 0.5, rel=1e-12)  # gamma * triangle area


def test_live_vis_smoke(tmp_path):
    """plot_live.update_live_vis drives a persistent Agg figure without
    raising (reference plot_live.py:30)."""
    import matplotlib

    matplotlib.use("Agg")
    from membrane_solver_tpu.meshgen import build
    from membrane_solver_tpu.visualization.plot_live import update_live_vis

    mesh = parse_geometry(build("cube"))
    state = None
    for _ in range(2):
        state = update_live_vis(mesh, state=state, color_by="tilt")
    assert state is not None


def test_compact_save_roundtrip(tmp_path):
    """compact=True drops provenance-only options (parent_facet) and indent
    but must stay loadable with identical geometry (reference io_writers
    compact mode)."""
    import json

    import numpy as np

    from membrane_solver_tpu.runtime.refinement import refine_triangle_mesh

    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    mesh = refine_triangle_mesh(mesh)  # creates parent_facet provenance
    full = tmp_path / "full.json"
    compact = tmp_path / "compact.json"
    save_geometry(mesh, full)
    save_geometry(mesh, compact, compact=True)
    assert compact.stat().st_size < full.stat().st_size
    data = json.loads(compact.read_text())
    assert not any(
        "parent_facet" in (entry[-1] if isinstance(entry[-1], dict) else {})
        for entry in data["faces"].values()
    )
    back = parse_geometry(data)
    assert sorted(back.vertices) == sorted(mesh.vertices)
    for vid in mesh.vertices:
        assert np.allclose(back.vertices[vid].position, mesh.vertices[vid].position)
    assert sorted(back.facets) == sorted(mesh.facets)
