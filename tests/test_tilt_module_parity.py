"""Numerical parity of the extended tilt-family energy modules.

Fixtures in tests/fixtures/module_parity/ were recorded from the reference
implementation (modules/energy/*.compute_energy_and_gradient_array) on the
kozlov hard-rim mesh with seeded random leaflet tilts; each module's energy,
shape gradient, and leaflet tilt gradients must match to ~1e-12.
"""

from __future__ import annotations

import dataclasses
import pathlib

import jax
import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "module_parity"
KOZLOV = "/root/reference/benchmarks/inputs/bench_kozlov_1disk_profile_hard_rim_R12.yaml"

MODULES = [
    "tilt_coupling",
    "tilt_splay_twist_in",
    "tilt_disk_contact_in",
    "rim_slope_match_out",
    "tilt_rim_source_in",
]

GP_OVERRIDES = {
    "tilt_coupling_mode": "difference",
    "tilt_coupling_modulus": 1.7,
    "tilt_splay_modulus_in": 2.3,
    "tilt_twist_modulus_in": 0.9,
    "rim_slope_match_strength": 1.3,
    "tilt_disk_contact_strength_in": 0.7,
    "tilt_rim_source_group_in": "rim",
    "tilt_rim_source_strength_in": 0.55,
    "tilt_rim_source_edge_mode": "all",
}


@pytest.fixture(scope="module")
def compiled():
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.device.state import build_params

    mesh = parse_geometry(load_data(KOZLOV))
    mesh.global_parameters.update(GP_OVERRIDES)
    for name in MODULES:
        mesh.energy_modules.append(name)
    tin = np.load(FIXTURES / "refmod_tin.npy")
    tout = np.load(FIXTURES / "refmod_tout.npy")
    for i, vid in enumerate(sorted(mesh.vertices)):
        mesh.vertices[vid].tilt_in = tin[i].copy()
        mesh.vertices[vid].tilt_out = tout[i].copy()
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    return p, build_params(mesh)


@pytest.mark.parametrize("name", MODULES)
def test_module_matches_reference(compiled, name):
    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.energy import get_module

    p, params = compiled
    geo = dgeo.triangle_geometry(p.state.positions, p.topo.tri_rows, p.topo.tri_valid)
    mod = get_module(name)
    maker = getattr(mod, "make_energy", None)
    fn = maker(p.spec) if maker is not None else mod.energy

    def E_of(state):
        return fn(geo, state, p.topo, params)

    ref = np.load(FIXTURES / f"refmod_{name}.npz")
    nv = p.n_vertices
    E = float(E_of(p.state))
    assert abs(E - float(ref["E"])) < 1e-12

    gshape = jax.grad(lambda x: E_of(dataclasses.replace(p.state, positions=x)))(
        p.state.positions
    )
    gin = jax.grad(lambda t: E_of(dataclasses.replace(p.state, tilts_in=t)))(
        p.state.tilts_in
    )
    gout = jax.grad(lambda t: E_of(dataclasses.replace(p.state, tilts_out=t)))(
        p.state.tilts_out
    )
    assert np.abs(np.asarray(gshape[:nv]) - ref["grad"]).max() < 1e-12
    assert np.abs(np.asarray(gin[:nv]) - ref["gin"]).max() < 1e-12
    assert np.abs(np.asarray(gout[:nv]) - ref["gout"]).max() < 1e-12
