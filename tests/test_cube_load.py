"""Load/parse tests on the canonical cube mesh (reference meshes/cube.json)."""

import json
from pathlib import Path

import numpy as np
import pytest

from membrane_solver_tpu import load_data, parse_geometry

CUBE = {
    "vertices": [
        [0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1],
        [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 1, 1],
    ],
    "edges": [
        [0, 1, {"color": "red"}], [1, 2, {"color": "red"}],
        [2, 3, {"color": "red"}], [3, 0, {"color": "red"}],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 5], [1, 6], [2, 7], [3, 4],
    ],
    "faces": [
        [0, 1, 2, 3, {"color": "blue"}],
        ["r0", 8, 5, "r9"],
        [9, 6, -10, -1],
        [-2, 10, 7, -11],
        [11, 4, -8, -3],
        [-5, -4, -7, -6],
    ],
    "bodies": {"faces": [[0, 1, 2, 3, 4, 5]], "target_volume": [1.0]},
    "global_parameters": {
        "surface_tension": 1.0,
        "volume_stiffness": 1e3,
        "volume_constraint_mode": "penalty",
    },
    "instructions": ["g50"],
}


@pytest.fixture
def cube_mesh(tmp_path):
    path = tmp_path / "cube.json"
    path.write_text(json.dumps(CUBE))
    return parse_geometry(load_data(path))


def test_cube_triangulated_on_load(cube_mesh):
    # 8 corners + 6 face centroids; each quad fans into 4 triangles
    assert len(cube_mesh.vertices) == 14
    assert len(cube_mesh.facets) == 24
    assert len(cube_mesh.edges) == 36
    assert all(len(cube_mesh.facet_vertex_loop(f)) == 3 for f in cube_mesh.facets.values())


def test_cube_modules(cube_mesh):
    assert "surface" in cube_mesh.energy_modules
    assert "volume" in cube_mesh.energy_modules  # penalty mode adds it
    assert list(cube_mesh.constraint_modules) == []


def test_cube_geometry_quantities(cube_mesh):
    assert cube_mesh.compute_total_surface_area() == pytest.approx(6.0, abs=1e-12)
    assert cube_mesh.compute_total_volume() == pytest.approx(1.0, abs=1e-12)
    body = cube_mesh.bodies[0]
    assert body.target_volume == pytest.approx(1.0)
    assert len(body.facet_indices) == 24


def test_cube_orientation_valid(cube_mesh):
    cube_mesh.validate_body_orientation()  # must not raise


def test_reference_cube_mesh_parses_if_available():
    ref = Path("/root/reference/meshes/cube.json")
    if not ref.exists():
        pytest.skip("reference meshes not mounted")
    mesh = parse_geometry(load_data(ref))
    assert len(mesh.vertices) == 14
    assert mesh.instructions[0] == "g50"
    assert np.isclose(mesh.compute_total_volume(), 1.0)
