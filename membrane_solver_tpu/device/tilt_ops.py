"""Tilt-field operators: P1 divergence per triangle and per vertex.

Parity: reference ``geometry/tilt_operators.py`` and
``fortran_kernels/tilt_kernels.f90:26-86`` — per-triangle P1 divergence
div(t) = sum_i t_i . g_i with g_i = (n x e_i)/|n|^2, and an area-weighted
vertex average of the triangle divergences.
"""

from __future__ import annotations

import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo


def p1_triangle_divergence(
    positions: jnp.ndarray,
    tilts: jnp.ndarray,
    tri_rows: jnp.ndarray,
    tri_valid: jnp.ndarray,
):
    """(div per triangle, triangle areas, shape gradients (F,3,3))."""
    geo = dgeo.triangle_geometry(positions, tri_rows, tri_valid)
    g = dgeo.p1_shape_gradients(geo)  # (F, corner, xyz)
    t0 = tilts[tri_rows[:, 0]]
    t1 = tilts[tri_rows[:, 1]]
    t2 = tilts[tri_rows[:, 2]]
    div = (
        jnp.sum(t0 * g[:, 0], axis=1)
        + jnp.sum(t1 * g[:, 1], axis=1)
        + jnp.sum(t2 * g[:, 2], axis=1)
    )
    div = jnp.where(tri_valid, div, 0.0)
    return div, geo.area, g


def p1_vertex_divergence(
    positions: jnp.ndarray,
    tilts: jnp.ndarray,
    tri_rows: jnp.ndarray,
    tri_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Area-weighted average of incident triangle divergences per vertex."""
    div, areas, _ = p1_triangle_divergence(positions, tilts, tri_rows, tri_valid)
    n_rows = positions.shape[0]
    w = areas / 3.0
    num = dgeo.scatter_add_rows(w * div, w * div, w * div, tri_rows, n_rows)
    den = dgeo.scatter_add_rows(w, w, w, tri_rows, n_rows)
    return jnp.where(den > 1e-15, num / jnp.maximum(den, 1e-15), 0.0)
