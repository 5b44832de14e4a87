"""Analytic-surface and symmetry invariants (reference test classes:
test_curvature_analytic_surfaces.py, test_bending_zero_energy.py,
tests/physics/test_tilt_symmetry.py).

- unit sphere: angle-defect sum = 4*pi exactly (closed Gauss-Bonnet),
  area-weighted mean curvature -> 1, inscribed areas increase toward
  4*pi, Gaussian-curvature RMSE decreases under refinement, and the
  Helfrich bending energy approaches the analytic 8*pi*kappa;
- flat sheet: bending energy ~ 0;
- leaflet symmetry: equal tilts + equal moduli give identical in/out
  energies and gradients;
- frame invariance: rigid rotation of positions and tilt fields leaves
  every active module energy unchanged.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import pytest


def _sphere_problem(n_subdiv):
    import jax.numpy as jnp

    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build

    data = build("sphere")
    data.setdefault("global_parameters", {}).update(
        {"bending_modulus": 1.0, "surface_tension": 0.0}
    )
    data["energy_modules"] = ["bending"]
    data.pop("instructions", None)
    data.pop("bodies", None)
    mesh = parse_geometry(data)
    from membrane_solver_tpu.runtime.refinement import refine_triangle_mesh

    for _ in range(n_subdiv):
        mesh = refine_triangle_mesh(mesh)
    # project to the exact unit sphere
    for v in mesh.vertices.values():
        p = np.asarray(v.position, dtype=float)
        v.position[:] = p / np.linalg.norm(p)
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    return mn, p, jnp


def test_sphere_curvature_converges_under_refinement():
    from membrane_solver_tpu.device import geo as dgeo

    levels = []
    for n_subdiv in (2, 3, 4):
        mn, p, jnp = _sphere_problem(n_subdiv)
        nv = p.n_vertices
        cd = dgeo.curvature_data(
            p.state.positions, p.topo.tri_rows, p.topo.tri_valid,
            p.state.positions.shape[0],
        )
        K_vecs, mixed_areas = cd.k_vecs, cd.vertex_areas
        defects = dgeo.angle_defects(
            p.state.positions, p.topo.tri_rows, p.topo.tri_valid,
            p.topo.vertex_valid,
        )
        mixed = np.asarray(mixed_areas)[:nv]
        H = 0.5 * np.linalg.norm(np.asarray(K_vecs)[:nv], axis=1) / np.maximum(
            mixed, 1e-300
        )
        K = np.asarray(defects)[:nv] / np.maximum(mixed, 1e-300)
        area = float(mn.mesh.compute_total_surface_area())
        w = mixed / mixed.sum()
        levels.append(
            {
                "defect_sum": float(np.asarray(defects)[:nv].sum()),
                "H_mean": float(np.sum(w * H)),
                "K_rmse": float(np.sqrt(np.sum(w * (K - 1.0) ** 2))),
                "area": area,
                "E_bend": float(mn.compute_energy()),
            }
        )

    target = 4.0 * math.pi
    for lev in levels:
        # closed surface: Gauss-Bonnet is exact at any resolution
        assert math.isclose(lev["defect_sum"], target, rel_tol=0.0, abs_tol=1e-9)
        assert abs(lev["H_mean"] - 1.0) < 5e-3

    # inscribed polyhedra approach the sphere area from below
    assert levels[0]["area"] < levels[1]["area"] < levels[2]["area"]
    assert (target - levels[2]["area"]) < 0.05 * target
    # curvature consistency improves with refinement
    assert levels[2]["K_rmse"] < levels[1]["K_rmse"] < levels[0]["K_rmse"]
    # Helfrich energy 1/2 k (2H)^2 A -> 8 pi k on the unit sphere
    assert levels[2]["E_bend"] == pytest.approx(8.0 * math.pi, rel=0.05)


def test_flat_sheet_bending_energy_is_zero():
    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build

    data = build("square_sheet")
    data.setdefault("global_parameters", {}).update({"bending_modulus": 2.0})
    data["energy_modules"] = ["bending"]
    data.pop("instructions", None)
    mesh = parse_geometry(data)
    mn = Minimizer(mesh, quiet=True)
    assert abs(float(mn.compute_energy())) < 1e-18


def _kozlov_state(seed=3):
    import jax.numpy as jnp

    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build

    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(
        {"tilt_modulus_in": 1.5, "tilt_modulus_out": 1.5}
    )
    p = Minimizer(mesh, quiet=True).problem()
    rng = np.random.default_rng(seed)
    tilts = 0.1 * rng.standard_normal(np.asarray(p.state.positions).shape)
    state = dataclasses.replace(
        p.state, tilts_in=jnp.asarray(tilts), tilts_out=jnp.asarray(tilts)
    )
    return p, state, mesh


def test_leaflet_tilt_symmetry():
    """Equal tilts and equal moduli: tilt_in and tilt_out agree exactly
    (reference tests/physics/test_tilt_symmetry.py)."""
    import jax

    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.energy import get_module

    p, state, mesh = _kozlov_state()
    params = build_params(mesh)
    geo = dgeo.triangle_geometry(state.positions, p.topo.tri_rows, p.topo.tri_valid)

    def energy(name):
        mod = get_module(name)
        maker = getattr(mod, "make_energy", None)
        fn = maker(p.spec) if maker is not None else mod.energy
        return lambda st: fn(geo, st, p.topo, params)

    e_in = float(energy("tilt_in")(state))
    e_out = float(energy("tilt_out")(state))
    assert e_in == pytest.approx(e_out, rel=0, abs=1e-14)

    g_in = np.asarray(
        jax.grad(lambda t: energy("tilt_in")(dataclasses.replace(state, tilts_in=t)))(
            state.tilts_in
        )
    )
    g_out = np.asarray(
        jax.grad(lambda t: energy("tilt_out")(dataclasses.replace(state, tilts_out=t)))(
            state.tilts_out
        )
    )
    np.testing.assert_allclose(g_in, g_out, atol=1e-14, rtol=0)


def test_rotation_invariance_of_module_energies():
    """A rigid rotation of positions and tilt fields leaves every active
    module energy unchanged (frame invariance of the physics)."""
    import jax.numpy as jnp

    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.energy import get_module
    from membrane_solver_tpu.runtime.jit_core import active_energy_modules

    p, state, mesh = _kozlov_state()
    params = build_params(mesh)

    # a nontrivial rotation about z (the lane's tagged rings/centers are
    # z-axis symmetric, so z-rotations keep option-derived geometry valid)
    th = 0.7
    R = np.array(
        [
            [math.cos(th), -math.sin(th), 0.0],
            [math.sin(th), math.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )

    def rotated(st):
        return dataclasses.replace(
            st,
            positions=jnp.asarray(np.asarray(st.positions) @ R.T),
            tilts=jnp.asarray(np.asarray(st.tilts) @ R.T),
            tilts_in=jnp.asarray(np.asarray(st.tilts_in) @ R.T),
            tilts_out=jnp.asarray(np.asarray(st.tilts_out) @ R.T),
        )

    st2 = rotated(state)
    geo1 = dgeo.triangle_geometry(state.positions, p.topo.tri_rows, p.topo.tri_valid)
    geo2 = dgeo.triangle_geometry(st2.positions, p.topo.tri_rows, p.topo.tri_valid)

    for name in active_energy_modules(p.spec):
        mod = get_module(name)
        maker = getattr(mod, "make_energy", None)
        fn = maker(p.spec) if maker is not None else mod.energy
        e1 = float(fn(geo1, state, p.topo, params))
        e2 = float(fn(geo2, st2, p.topo, params))
        assert e2 == pytest.approx(e1, rel=1e-10, abs=1e-12), name
