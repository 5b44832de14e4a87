"""Extended per-module numerical parity vs recorded reference fixtures.

Fixtures in tests/fixtures/module_parity2/ were recorded by
tools/record_module_parity.py: each module evaluated IN ISOLATION by the
reference's EvaluationManager on a seeded state; energy, shape gradient,
and tilt gradients must match to ~1e-11.  This covers the full tilt /
bending family plus gaussian_curvature, jordan_area, expression,
edge_length_penalty, line_tension and surface (VERDICT round-1 item 5).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "module_parity2"
KOZLOV = "/root/reference/benchmarks/inputs/bench_kozlov_1disk_profile_hard_rim_R12.yaml"

# mirror tools/record_module_parity.py
KOZLOV_GP = {
    "tilt_disk_target_group_in": "disk",
    "tilt_disk_target_group_out": "disk",
    "surface_tension": 0.7,
    "bending_modulus": 0.8,
    "spontaneous_curvature": 0.15,
    "gaussian_modulus": 0.6,
    "tilt_smoothness_modulus_in": 1.1,
    "tilt_smoothness_modulus_out": 1.2,
    "tilt_disk_target_strength_in": 0.5,
    "tilt_disk_target_theta_B_in": 0.2,
    "tilt_disk_target_strength_out": 0.4,
    "tilt_disk_target_theta_B_out": 0.1,
    "tilt_rim_source_group_out": "rim",
    "tilt_rim_source_strength_out": 0.35,
    "tilt_rim_source_group": "rim",
    "tilt_rim_source_strength": 0.25,
    "tilt_modulus": 0.9,
    "tilt_smoothness_modulus": 0.65,
    "tilt_rigidity": 0.9,
    "tilt_smoothness_rigidity": 0.65,
    "tilt_rim_source_edge_mode": "all",
    "tilt_thetaB_value": 0.27,
    "tilt_thetaB_contact_penalty_mode": "legacy",
    "curved_local_interface_law_strength": 0.8,
    "curved_local_interface_penalty_strength": 0.7,
}

KOZLOV_MODULES = [
    "bending",
    "gaussian_curvature",
    "tilt_in",
    "tilt_out",
    "tilt_smoothness_in",
    "tilt_smoothness_out",
    "bending_tilt_in",
    "bending_tilt_out",
    "tilt_disk_target_in",
    "tilt_disk_target_out",
    "tilt_rim_source_out",
    "tilt_rim_source_bilayer",
    "tilt_thetaB_contact_in",
    "curved_local_interface_law",
    "curved_local_interface_penalty",
]
VERTEX_MODULES = ["tilt", "tilt_smoothness", "bending_tilt"]
FLAT_MODULES = ["surface", "jordan_area", "edge_length_penalty", "expression", "line_tension"]
CUBE_BODY_MODULES = ["body_area_penalty"]


def _tag_disk_targets(mesh):
    for v in mesh.vertices.values():
        opts = v.options or {}
        if str(opts.get("rim_slope_match_group") or "") == "disk":
            opts["tilt_disk_target_group_in"] = "disk"
            opts["tilt_disk_target_group_out"] = "disk"
            v.options = opts


def _load_seeded(mesh, lane, p):
    vids = np.load(FIXTURES / f"refmod2_{lane}_vids.npy")
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in vids])
    return vids, perm


def _compile(lane, modules, seed_fields):
    import sys

    sys.path.insert(0, "/root/repo")
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.device.state import build_params

    if lane.startswith("kozlov"):
        from tools.record_module_parity import CONN_GP, SCAFFOLD, SCAFFOLD_GP

        src, gp = {
            "kozlov_scaffold": (SCAFFOLD, SCAFFOLD_GP),
            "kozlov_conn": (KOZLOV, CONN_GP),
        }.get(lane, (KOZLOV, KOZLOV_GP))
        mesh = parse_geometry(load_data(src))
        mesh.global_parameters.update(gp)
        _tag_disk_targets(mesh)
        # same seeded jitter as the recorder: perturb off the flat |K| = 0
        # kink state so curvature gradients are well-defined
        rng = np.random.default_rng(31)
        for vid in sorted(mesh.vertices):
            mesh.vertices[int(vid)].position[2] += 0.02 * rng.standard_normal()
    elif lane == "cube_body":
        from tools.record_module_parity import cube_body_dict

        mesh = parse_geometry(json.loads(json.dumps(cube_body_dict())))
    else:
        from tools.record_module_parity import flat_lane_dict

        mesh = parse_geometry(json.loads(json.dumps(flat_lane_dict())))
    for name in modules:
        if name not in mesh.energy_modules:
            mesh.energy_modules.append(name)
    vids = np.load(FIXTURES / f"refmod2_{lane}_vids.npy")
    attr_of = {"tin": "tilt_in", "tout": "tilt_out", "tilt": "tilt"}
    for field in seed_fields:
        arr = np.load(FIXTURES / f"refmod2_{lane}_{field}.npy")
        for i, vid in enumerate(vids):
            setattr(mesh.vertices[int(vid)], attr_of[field], arr[i].copy())
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    return p, build_params(mesh)


@pytest.fixture(scope="module")
def kozlov_compiled():
    return _compile("kozlov", KOZLOV_MODULES, ["tin", "tout"])


@pytest.fixture(scope="module")
def vertex_compiled():
    return _compile("kozlov_vertex", VERTEX_MODULES, ["tilt"])


@pytest.fixture(scope="module")
def flat_compiled():
    return _compile("flat", FLAT_MODULES, [])


def _check(p, params, lane, name, tol=1e-11):
    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.energy import get_module

    fx = np.load(FIXTURES / f"refmod2_{lane}_{name}.npz")
    vids = np.load(FIXTURES / f"refmod2_{lane}_vids.npy")
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in vids])

    geo = dgeo.triangle_geometry(p.state.positions, p.topo.tri_rows, p.topo.tri_valid)
    mod = get_module(name)
    maker = getattr(mod, "make_energy", None)
    fn = maker(p.spec) if maker is not None else mod.energy

    def E_of(state):
        return fn(geo, state, p.topo, params)

    E = float(E_of(p.state))
    assert abs(E - float(fx["E"])) < max(tol, tol * abs(float(fx["E"]))), (
        f"{name}: E={E} vs ref {float(fx['E'])}"
    )

    gshape = np.asarray(
        jax.grad(lambda x: fn(
            dgeo.triangle_geometry(x, p.topo.tri_rows, p.topo.tri_valid),
            dataclasses.replace(p.state, positions=x), p.topo, params))(p.state.positions)
    )[perm]
    scale = max(np.abs(fx["grad"]).max(), 1.0)
    assert np.abs(gshape - fx["grad"]).max() < tol * 100 * scale, name

    if "gin" in fx:
        gin = np.asarray(jax.grad(lambda t: E_of(dataclasses.replace(p.state, tilts_in=t)))(p.state.tilts_in))[perm]
        gout = np.asarray(jax.grad(lambda t: E_of(dataclasses.replace(p.state, tilts_out=t)))(p.state.tilts_out))[perm]
        assert np.abs(gin - fx["gin"]).max() < tol * 100 * scale, name
        assert np.abs(gout - fx["gout"]).max() < tol * 100 * scale, name
    if "gtilt" in fx:
        gt = np.asarray(jax.grad(lambda t: E_of(dataclasses.replace(p.state, tilts=t)))(p.state.tilts))[perm]
        assert np.abs(gt - fx["gtilt"]).max() < tol * 100 * scale, name


@pytest.mark.parametrize("name", KOZLOV_MODULES)
def test_kozlov_module_parity(kozlov_compiled, name):
    p, params = kozlov_compiled
    _check(p, params, "kozlov", name)


@pytest.mark.parametrize("name", VERTEX_MODULES)
def test_vertex_module_parity(vertex_compiled, name):
    p, params = vertex_compiled
    _check(p, params, "kozlov_vertex", name)


@pytest.mark.parametrize("name", FLAT_MODULES)
def test_flat_module_parity(flat_compiled, name):
    p, params = flat_compiled
    _check(p, params, "flat", name)


@pytest.fixture(scope="module")
def cube_body_compiled():
    return _compile("cube_body", CUBE_BODY_MODULES, [])


@pytest.mark.parametrize("name", CUBE_BODY_MODULES)
def test_cube_body_module_parity(cube_body_compiled, name):
    p, params = cube_body_compiled
    _check(p, params, "cube_body", name)


# --- Leaflet-trio BRANCH parity (VERDICT r3 item 5): the shared
# tilt_leaflet / tilt_smoothness_leaflet / bending_tilt_leaflet
# implementations evaluated on lane states that flip their leaflet-specific
# branches, vs fixtures recorded from the reference on the same states:
#
# kozlov_scaffold — the reference's physical-edge scaffold release fixture:
#   leaflet_out absence masks (presets [disk], mode triangles),
#   tilt_mass_mode_in=consistent, assume-J0 presets + flat-reference base
#   term, inner-scaffold trace rows (reference tilt_leaflet.py:44-57,
#   bending_tilt_leaflet.py:170-225).
# kozlov_conn — the R12 lane under tilt_transport_model=connection_v1 and
#   tilt_mass_mode=consistent (reference tilt_smoothness.py:40-48,143-148;
#   tilt_params.py:15-24).

SCAFFOLD_MODULES = [
    "tilt_in",
    "tilt_out",
    "tilt_smoothness_in",
    "tilt_smoothness_out",
    "bending_tilt_in",
    "bending_tilt_out",
]
CONN_MODULES = ["tilt_in", "tilt_out", "tilt_smoothness_in", "tilt_smoothness_out"]


@pytest.fixture(scope="module")
def scaffold_compiled():
    return _compile("kozlov_scaffold", SCAFFOLD_MODULES, ["tin", "tout"])


@pytest.fixture(scope="module")
def conn_compiled():
    return _compile("kozlov_conn", CONN_MODULES, ["tin", "tout"])


@pytest.mark.parametrize("name", SCAFFOLD_MODULES)
def test_scaffold_branch_module_parity(scaffold_compiled, name):
    p, params = scaffold_compiled
    _check(p, params, "kozlov_scaffold", name)


@pytest.mark.parametrize("name", CONN_MODULES)
def test_connection_transport_module_parity(conn_compiled, name):
    p, params = conn_compiled
    _check(p, params, "kozlov_conn", name)
