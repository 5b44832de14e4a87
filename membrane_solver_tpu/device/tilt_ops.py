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


def minimal_rotation_transport(src_unit: jnp.ndarray, dst_unit: jnp.ndarray) -> jnp.ndarray:
    """Row-wise minimal-rotation matrices taking src normals onto dst normals.

    Parity: geometry/tangent_transport.py:33-69 (Rodrigues form
    R = I + [k]x + [k]x^2 / (1 + a.b) with k = a x b; antiparallel rows fall
    back to a 180-degree flip about a tangent axis).  Branch-free for jit.
    """
    n = src_unit.shape[0]
    dtype = src_unit.dtype
    cross = jnp.cross(src_unit, dst_unit)
    dot = jnp.sum(src_unit * dst_unit, axis=1)

    x, y, z = cross[:, 0], cross[:, 1], cross[:, 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=1),
            jnp.stack([z, zeros, -x], axis=1),
            jnp.stack([-y, x, zeros], axis=1),
        ],
        axis=1,
    )  # (N, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
    denom = 1.0 / jnp.maximum(1.0 + dot, 1e-10)
    rodrigues = eye + K + jnp.matmul(K, K) * denom[:, None, None]

    good = (dot > -1.0 + 1e-10) & (jnp.linalg.norm(cross, axis=1) > 1e-15)

    # antiparallel: reflect through a tangent axis perpendicular to src
    seed = jnp.where(
        (jnp.abs(src_unit[:, 0]) > 0.9)[:, None],
        jnp.asarray([0.0, 1.0, 0.0], dtype),
        jnp.asarray([1.0, 0.0, 0.0], dtype),
    )
    tangent = seed - jnp.sum(seed * src_unit, axis=1, keepdims=True) * src_unit
    tnorm = jnp.linalg.norm(tangent, axis=1, keepdims=True)
    tangent = tangent / jnp.maximum(tnorm, 1e-15)
    flip = 2.0 * tangent[:, :, None] * tangent[:, None, :] - jnp.eye(3, dtype=dtype)
    anti = dot <= -1.0 + 1e-10

    out = jnp.where(good[:, None, None], rodrigues, eye)
    return jnp.where(anti[:, None, None], flip, out)


def transport_tilts_to_triangle_planes(
    positions: jnp.ndarray,
    tilts: jnp.ndarray,
    vertex_normals: jnp.ndarray,
    tri_rows: jnp.ndarray,
    tri_valid: jnp.ndarray,
):
    """Transport per-vertex tilts into triangle planes (connection_v1 model).

    Returns (t0, t1, t2, r0, r1, r2): transported corner tilts and the
    transport rotations (for pulling gradients back to the vertex planes).
    Parity: geometry/tangent_transport.py:84-132.
    """
    geo = dgeo.triangle_geometry(positions, tri_rows, tri_valid)
    tri_n = geo.unit_normal
    outs = []
    rots = []
    for c in range(3):
        rows = tri_rows[:, c]
        r = minimal_rotation_transport(vertex_normals[rows], tri_n)
        outs.append(jnp.einsum("nij,nj->ni", r, tilts[rows]))
        rots.append(r)
    return outs[0], outs[1], outs[2], rots[0], rots[1], rots[2]


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
