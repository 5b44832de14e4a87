"""Direct unit lanes for auxiliary helpers that e2e lanes only touch
indirectly: Gauss-Bonnet boundary machinery, the AOT structure codec,
mesh-quality metrics, the per-module energy breakdown, file-path geometry
loading, the joint tilt KKT projector, and the DEBUG tangency audit.

Parity targets per test: reference runtime/diagnostics/audit.py,
runtime/diagnostics/gauss_bonnet.py, geometry/geom_io.py.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.geometry.io_readers import load_geometry
from membrane_solver_tpu.geometry.io_writers import save_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.runtime import jit_core
from membrane_solver_tpu.runtime.diagnostics.gauss_bonnet import (
    boundary_geodesic_sum,
    extract_boundary_loops,
    find_boundary_edges,
    gauss_bonnet_invariant,
)
from membrane_solver_tpu.runtime.quality import triangle_aspect_percentile
from membrane_solver_tpu.runtime.tilt_relax import project_tilt_gradients_kkt
from membrane_solver_tpu.utils.aot_cache import decode_structure, encode_structure


# ----------------------------------------------------------- Gauss-Bonnet
def test_gauss_bonnet_closed_surface_is_4pi():
    """Closed genus-0 surface: no boundary edges, G = 2*pi*chi = 4*pi."""
    mesh = parse_geometry(build("cube"))
    assert find_boundary_edges(mesh) == []
    G, k_int, b_total, per_loop = gauss_bonnet_invariant(mesh)
    assert b_total == 0.0 and per_loop == {}
    assert G == pytest.approx(4.0 * np.pi, rel=1e-10)


def test_gauss_bonnet_disk_is_2pi_with_one_loop():
    """Flat disk: one boundary loop, K_int ~ 0, B ~ 2*pi (chi = 1)."""
    mesh = parse_geometry(build("flat_disk"))
    boundary = find_boundary_edges(mesh)
    assert boundary, "open disk must have boundary edges"
    loops = extract_boundary_loops(mesh, boundary)
    assert len(loops) == 1
    # the loop is a closed chain of distinct boundary vertices
    assert len(set(loops[0])) == len(loops[0])
    G, k_int, b_total, per_loop = gauss_bonnet_invariant(mesh)
    assert k_int == pytest.approx(0.0, abs=1e-10)  # flat interior
    assert b_total == pytest.approx(2.0 * np.pi, rel=1e-10)
    assert G == pytest.approx(2.0 * np.pi, rel=1e-10)
    # per-loop sums agree with the standalone helper
    assert boundary_geodesic_sum(mesh, loops) == per_loop


def test_gauss_bonnet_torus_is_zero():
    """Torus: chi = 0, so the closed-surface angle defects sum to ~0."""
    mesh = parse_geometry(build("torus"))
    assert find_boundary_edges(mesh) == []
    G, _k, b, _ = gauss_bonnet_invariant(mesh)
    assert b == 0.0
    assert G == pytest.approx(0.0, abs=1e-8)


# ------------------------------------------------------ AOT structure codec
def test_aot_structure_codec_roundtrip_nested():
    obj = {
        "b": (jnp.asarray([1.0, 2.0]), None, [jnp.asarray(3), {"x": jnp.asarray(4.5)}]),
        "a": jnp.ones((2, 2)),
    }
    import jax

    leaves, _tree = jax.tree_util.tree_flatten(obj)
    desc = encode_structure(obj)
    out = decode_structure(desc, leaves)
    assert isinstance(out["b"], tuple) and out["b"][1] is None
    assert np.allclose(np.asarray(out["a"]), 1.0)
    assert float(out["b"][2][1]["x"]) == 4.5
    # leaf-count mismatch must fail loudly, not silently truncate
    with pytest.raises(ValueError):
        decode_structure(desc, leaves + [jnp.asarray(0.0)])


def test_aot_structure_codec_registered_dataclass():
    """MeshState (a registered pytree dataclass) round-trips by class name."""
    import jax

    p = Minimizer(parse_geometry(build("cube")), quiet=True).problem()
    leaves, _ = jax.tree_util.tree_flatten(p.state)
    out = decode_structure(encode_structure(p.state), leaves)
    assert type(out).__name__ == type(p.state).__name__
    assert np.allclose(np.asarray(out.positions), np.asarray(p.state.positions))


# ------------------------------------------------------------ mesh quality
def test_triangle_aspect_percentile_right_isoceles_grid():
    """square_sheet triangulates into right isoceles triangles: every
    triangle has h_max/h_min = sqrt(2), so every percentile equals it."""
    mn = Minimizer(parse_geometry(build("square_sheet")), quiet=True)
    for pct in (10.0, 50.0, 90.0):
        assert triangle_aspect_percentile(mn, pct) == pytest.approx(
            np.sqrt(2.0), rel=1e-12
        )


# ------------------------------------------------------- energy breakdown
def test_energy_breakdown_sums_to_total_energy():
    mn = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True)
    total = float(mn.compute_energy())
    parts = mn.compute_energy_breakdown()
    assert len(parts) >= 2  # flagship lane has multiple active modules
    assert sum(parts.values()) == pytest.approx(total, rel=1e-12, abs=1e-12)


# --------------------------------------------------- file-path convenience
def test_load_geometry_roundtrip(tmp_path):
    mesh = parse_geometry(build("cube"))
    path = tmp_path / "cube.json"
    save_geometry(mesh, path)
    again = load_geometry(path)
    assert len(again.vertices) == len(mesh.vertices)
    assert len(again.facets) == len(mesh.facets)
    e0 = float(Minimizer(mesh, quiet=True).compute_energy())
    e1 = float(Minimizer(again, quiet=True).compute_energy())
    assert e1 == pytest.approx(e0, rel=1e-12)


# ------------------------------------------------- joint tilt KKT projector
def test_project_tilt_gradients_kkt_orthogonal_to_rows():
    rng = np.random.default_rng(7)
    n = 4
    gin = jnp.asarray(rng.normal(size=(n, 3)))
    gout = jnp.asarray(rng.normal(size=(n, 3)))
    rows = jnp.asarray(rng.normal(size=(2, 2 * n * 3)))
    pin, pout = project_tilt_gradients_kkt(gin, gout, rows)
    g = np.concatenate([np.asarray(pin).ravel(), np.asarray(pout).ravel()])
    G = np.asarray(rows).reshape(2, -1)
    # projected gradient lies in the null space of the constraint rows
    assert np.allclose(G @ g, 0.0, atol=1e-10)
    # the removed part lies in the row span: re-projecting is a no-op
    pin2, pout2 = project_tilt_gradients_kkt(pin, pout, rows)
    assert np.allclose(np.asarray(pin2), np.asarray(pin), atol=1e-12)
    assert np.allclose(np.asarray(pout2), np.asarray(pout), atol=1e-12)
    # rows=None is the identity fast path
    iin, iout = project_tilt_gradients_kkt(gin, gout, None)
    assert iin is gin and iout is gout


# ----------------------------------------------------- DEBUG tangency audit
def test_lagrange_tangency_check_logs_at_debug(caplog):
    """The monitor emits <gradE, gradV> per volume-constrained body when the
    package logger is at DEBUG (reference minimizer.py:1012 call site)."""
    mn = Minimizer(parse_geometry(build("cube")), quiet=True)
    # the monitor is lagrange-mode-only (penalty mode needs no tangency)
    mn.global_params.set("volume_constraint_mode", "lagrange")
    with caplog.at_level(logging.DEBUG, logger="membrane_solver_tpu"):
        mn.compute_energy_and_gradient()
    msgs = [r.message for r in caplog.records if "Lagrange tangency" in r.message]
    assert msgs, "expected a tangency line for the volume-constrained cube body"
    # and silence when DEBUG is off
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="membrane_solver_tpu"):
        mn.compute_energy_and_gradient()
    assert not [r for r in caplog.records if "Lagrange tangency" in r.message]
