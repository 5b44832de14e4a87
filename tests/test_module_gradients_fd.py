"""Finite-difference gradient verification for the newer energy modules.

Parity: the reference's per-kernel FD lanes
(tests/test_bending_finite_difference.py,
test_energy_gradient_directional_derivative.py) — each module's AD
gradient must match a central finite difference along a random direction.
Modules whose gradients are deliberately frozen/approximate in the
reference (smoothness: no shape gradient; theta_B contact: scalar work;
gaussian curvature: stopped) are checked for the fields they DO
differentiate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.energy import get_module
from membrane_solver_tpu.meshgen import build


@pytest.fixture(scope="module")
def kozlov_problem():
    data = build("kozlov_1disk", n_sectors=8, n_outer_rings=4, n_disk_rings=2)
    gp = data["global_parameters"]
    gp.update(
        {
            "tilt_coupling_modulus": 0.5,
            "tilt_splay_modulus_in": 0.7,
            "tilt_rim_source_strength_in": 0.3,
            "tilt_rim_source_strength_out": 0.3,
            "tilt_rim_source_strength": 0.25,
            "tilt_disk_target_strength_in": 0.4,
            "tilt_disk_target_value_in": 0.2,
            "tilt_disk_target_strength_out": 0.4,
            "tilt_disk_target_value_out": 0.15,
            "tilt_disk_contact_strength_in": 0.3,
            # activation keys: coupling needs a mode; rim sources need a
            # tagged ring group ("all" keeps interior ring edges); disk
            # targets/contact collect rows from the tags applied below
            "tilt_coupling_mode": "difference",
            "tilt_rim_source_group_in": "rim",
            "tilt_rim_source_group_out": "rim",
            "tilt_rim_source_group": "rim",
            "tilt_rim_source_edge_mode": "all",
            "tilt_disk_target_group_in": "dt_ring",
            "tilt_disk_target_group_out": "dt_ring",
        }
    )
    # every FD-tested module must be in the compiled module list: the
    # compile_topology extras (group rows, ring tables) only exist for
    # listed modules, and a module without its extras evaluates to zero —
    # which used to make four of these lanes silently vacuous
    for name in MODULES_TILT_GRAD:
        if name not in data["energy_modules"]:
            data["energy_modules"].append(name)
    mesh = parse_geometry(data)
    for v in mesh.vertices.values():
        opts = v.options or {}
        if opts.get("rim_slope_match_group") == "rim":
            opts["tilt_disk_target_group_in"] = "dt_ring"
            opts["tilt_disk_target_group_out"] = "dt_ring"
        if opts.get("tilt_thetaB_group_in") == "disk":
            opts["tilt_disk_contact_group"] = "disk"
    rng = np.random.default_rng(7)
    for v in mesh.vertices.values():
        if not (v.tilt_fixed_in or v.tilt_fixed_out):
            v.tilt_in = 0.1 * rng.standard_normal(3)
            v.tilt_out = 0.1 * rng.standard_normal(3)
    mn = Minimizer(mesh, quiet=True)
    return mn.problem()


MODULES_TILT_GRAD = [
    "tilt_in",
    "tilt_out",
    "tilt_coupling",
    "tilt_splay_twist_in",
    "tilt_smoothness_in",
    "tilt_smoothness_out",
    "tilt_rim_source_in",
    "tilt_rim_source_out",
    "tilt_rim_source_bilayer",
    "tilt_disk_target_in",
    "tilt_disk_target_out",
    "tilt_disk_contact_in",
    "bending_tilt_in",
    "bending_tilt_out",
]


def _module_energy_fn(name, p):
    module = get_module(name)
    maker = getattr(module, "make_energy", None)
    fn = maker(p.spec) if maker is not None else module.energy

    def energy(state):
        geo = dgeo.triangle_geometry(state.positions, p.topo.tri_rows, p.topo.tri_valid)
        return fn(geo, state, p.topo, p.params)

    return energy


@pytest.mark.parametrize("name", MODULES_TILT_GRAD)
def test_tilt_gradient_matches_fd(name, kozlov_problem):
    p = kozlov_problem
    energy = _module_energy_fn(name, p)
    state = p.state

    def e_of_tin(tin):
        return energy(dataclasses.replace(state, tilts_in=tin))

    e0 = float(e_of_tin(state.tilts_in))
    if name == "tilt_out" or name.endswith("_out"):
        # differentiate the out field instead
        def e_of_t(t):
            return energy(dataclasses.replace(state, tilts_out=t))

        base = state.tilts_out
    else:
        e_of_t = e_of_tin
        base = state.tilts_in

    g = jax.grad(e_of_t)(base)
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal(base.shape))
    d = jnp.where(p.topo.vertex_valid[:, None], d, 0.0)
    h = 1e-6
    fd = (float(e_of_t(base + h * d)) - float(e_of_t(base - h * d))) / (2 * h)
    ad = float(jnp.sum(g * d))
    if abs(e0) < 1e-14 and abs(fd) < 1e-14 and abs(ad) < 1e-14:
        pytest.fail(f"{name} is inactive on the FD lane (energy identically 0)")
    assert abs(ad - fd) <= 1e-6 * max(abs(fd), 1.0), f"{name}: AD {ad} vs FD {fd}"


SHAPE_GRAD_MODULES = ["surface", "volume", "line_tension", "bending", "body_area_penalty"]


@pytest.mark.parametrize("name", SHAPE_GRAD_MODULES)
def test_shape_gradient_matches_fd(name):
    data = build("cube")
    gp = data["global_parameters"]
    gp.update({"bending_modulus": 0.5, "line_tension": 0.2, "body_area_stiffness": 0.3,
               "body_area_target": 5.0})
    # modules must be in the compile-time list so their compile_topology
    # hooks populate topo.extras
    data["energy_modules"] = ["surface", "volume", "line_tension", "bending",
                              "body_area_penalty"]
    mesh = parse_geometry(data)
    lt = iter(sorted(mesh.edges))
    for eid in list(mesh.edges)[:8]:
        mesh.edges[eid].options["line_tension"] = 0.2
    mn = Minimizer(mesh, quiet=True)
    mn.minimize(3)  # move off the symmetric start
    p = mn.problem()
    energy = _module_energy_fn(name, p)
    state = p.state

    def e_of_pos(pos):
        return energy(dataclasses.replace(state, positions=pos))

    g = jax.grad(e_of_pos)(state.positions)
    rng = np.random.default_rng(5)
    d = jnp.asarray(rng.standard_normal(state.positions.shape))
    d = jnp.where(p.topo.vertex_valid[:, None], d, 0.0)
    h = 1e-6
    fd = (float(e_of_pos(state.positions + h * d)) - float(e_of_pos(state.positions - h * d))) / (2 * h)
    ad = float(jnp.sum(g * d))
    if abs(fd) < 1e-14 and abs(ad) < 1e-14:
        return
    assert abs(ad - fd) <= 5e-5 * max(abs(fd), 1.0), f"{name}: AD {ad} vs FD {fd}"
