"""Pallas-kernel vs XLA-path parity (the analog of the reference's
tests/test_fortran_kernels.py NumPy-vs-Fortran comparisons).

Runs the kernels in interpreter mode on CPU at f32 and compares against
the stock device/geo implementations evaluated at f32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.device.tilt_ops import p1_triangle_divergence
from membrane_solver_tpu.pallas_kernels import (
    curvature_corners_pallas,
    p1_divergence_pallas,
    surface_corner_grads_pallas,
)


@pytest.fixture(scope="module")
def tri_data():
    rng = np.random.default_rng(11)
    T, Nv = 200, 90
    tri_rows = rng.integers(0, Nv, size=(T, 3)).astype(np.int32)
    # avoid degenerate repeated corners
    tri_rows[:, 1] = (tri_rows[:, 0] + 1 + tri_rows[:, 1] % (Nv - 2)) % Nv
    tri_rows[:, 2] = (tri_rows[:, 1] + 1 + tri_rows[:, 2] % (Nv - 2)) % Nv
    positions = rng.standard_normal((Nv, 3)).astype(np.float32)
    tilts = 0.3 * rng.standard_normal((Nv, 3)).astype(np.float32)
    valid = np.ones(T, dtype=bool)
    valid[-7:] = False
    return (
        jnp.asarray(positions),
        jnp.asarray(tri_rows),
        jnp.asarray(valid),
        jnp.asarray(tilts),
    )


def test_surface_kernel_multiblock_parity():
    """T > one grid tile (512): the multi-block grid must cover the tail."""
    rng = np.random.default_rng(4)
    T, Nv = 1300, 400
    tri_rows = rng.integers(0, Nv, size=(T, 3)).astype(np.int32)
    tri_rows[:, 1] = (tri_rows[:, 0] + 1) % Nv
    tri_rows[:, 2] = (tri_rows[:, 1] + 7) % Nv
    positions = jnp.asarray(rng.standard_normal((Nv, 3)).astype(np.float32))
    valid = jnp.ones(T, dtype=bool)
    p0, p1, p2 = (positions[tri_rows[:, i]] for i in range(3))
    gamma = jnp.full((T,), jnp.float32(1.3))
    e_tri, _g0, _g1, _g2 = surface_corner_grads_pallas(p0, p1, p2, gamma)
    geo = dgeo.triangle_geometry(positions, jnp.asarray(tri_rows), valid)
    np.testing.assert_allclose(
        np.asarray(e_tri), np.asarray(1.3 * geo.area), rtol=2e-5, atol=1e-6
    )


def test_surface_kernel_parity(tri_data):
    positions, tri_rows, valid, _ = tri_data
    p0, p1, p2 = (positions[tri_rows[:, i]] for i in range(3))
    gamma = jnp.where(valid, jnp.float32(1.7), 0.0)
    e_tri, g0, g1, g2 = surface_corner_grads_pallas(p0, p1, p2, gamma)

    geo = dgeo.triangle_geometry(positions, tri_rows, valid)
    np.testing.assert_allclose(
        np.asarray(e_tri), np.asarray(1.7 * geo.area * valid), rtol=2e-6, atol=1e-7
    )
    # corner grads: dA/dv0 = 0.5 (v2-v1) x n_hat
    ref_g0 = 0.5 * jnp.cross(p2 - p1, geo.unit_normal) * gamma[:, None]
    np.testing.assert_allclose(np.asarray(g0), np.asarray(ref_g0), rtol=2e-5, atol=1e-6)


def test_curvature_kernel_parity(tri_data):
    positions, tri_rows, valid, _ = tri_data
    p0, p1, p2 = (positions[tri_rows[:, i]] for i in range(3))
    cot, k0, k1, k2, va, tri_areas = curvature_corners_pallas(p0, p1, p2, valid)

    curv = dgeo.curvature_data(positions, tri_rows, valid, positions.shape[0])
    # scatter the pallas corner K vectors and compare against the XLA path
    k_scattered = dgeo.scatter_add_rows(k0, k1, k2, tri_rows, positions.shape[0])
    np.testing.assert_allclose(
        np.asarray(k_scattered), np.asarray(curv.k_vecs), rtol=5e-5, atol=1e-5
    )
    va_scattered = dgeo.scatter_add_rows(
        va[:, 0], va[:, 1], va[:, 2], tri_rows, positions.shape[0]
    )
    np.testing.assert_allclose(
        np.asarray(va_scattered), np.asarray(curv.vertex_areas), rtol=5e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cot), np.asarray(curv.weights), rtol=5e-5, atol=1e-5
    )


def test_p1_divergence_kernel_parity(tri_data):
    positions, tri_rows, valid, tilts = tri_data
    p0, p1, p2 = (positions[tri_rows[:, i]] for i in range(3))
    t0, t1, t2 = (tilts[tri_rows[:, i]] for i in range(3))
    div, area, g0, g1, g2 = p1_divergence_pallas(p0, p1, p2, t0, t1, t2)

    ref_div, ref_area, ref_grads = p1_triangle_divergence(
        positions, tilts, tri_rows, valid
    )
    live = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(div)[live], np.asarray(ref_div)[live], rtol=5e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(area)[live], np.asarray(ref_area)[live], rtol=5e-5, atol=1e-6
    )


def test_scatter_matmul_path_full_precision(monkeypatch):
    """The MXU one-hot matmul scatter must not round values to bf16.

    Forces the matmul branch (normally TPU-only) on CPU and compares against
    the exact f64 scatter; regression for the Precision.HIGHEST annotation.
    """
    from membrane_solver_tpu.device import geo as dgeo

    monkeypatch.setattr(dgeo.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(3)
    F, Nv = 1500, 400
    rows = jnp.asarray(rng.integers(0, Nv, (F, 3)), jnp.int32)
    v0, v1, v2 = (
        jnp.asarray(rng.standard_normal((F, 3)), jnp.float32) for _ in range(3)
    )
    out = dgeo.scatter_add_rows(v0, v1, v2, rows, Nv)
    ref = np.zeros((Nv, 3), np.float64)
    np.add.at(ref, np.asarray(rows)[:, 0], np.asarray(v0, np.float64))
    np.add.at(ref, np.asarray(rows)[:, 1], np.asarray(v1, np.float64))
    np.add.at(ref, np.asarray(rows)[:, 2], np.asarray(v2, np.float64))
    assert np.max(np.abs(np.asarray(out, np.float64) - ref)) < 1e-4
