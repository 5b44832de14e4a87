"""Direct unit lanes for the device geometry / tilt-operator kernels.

Every assertion is against an analytic expectation on a hand-built
configuration (not a recorded fixture), so these lanes pin the kernel
math itself.  Parity targets: reference geometry/triangle_ops.py,
geometry/tangent_transport.py, geometry/tilt_operators.py,
runtime/topology.py (see each test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.device.tilt_ops import (
    minimal_rotation_transport,
    p1_triangle_divergence,
    p1_vertex_divergence,
)


def _single_triangle(pts):
    """positions, tri_rows, tri_valid for one triangle (plus a padded row)."""
    positions = jnp.asarray(np.vstack([pts, [[9.0, 9.0, 9.0]]]))
    tri_rows = jnp.asarray([[0, 1, 2], [0, 0, 0]], dtype=jnp.int32)
    tri_valid = jnp.asarray([True, False])
    return positions, tri_rows, tri_valid


EQUILATERAL = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, np.sqrt(3.0) / 2.0, 0.0]]
)


# ---------------------------------------------------------------- safe_norm
def test_safe_norm_values_and_zero_row_gradient():
    vecs = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0], [1e-10, 0.0, 0.0]])
    norms = dgeo.safe_norm(vecs)
    assert np.allclose(np.asarray(norms), [5.0, 0.0, 0.0])
    # the whole point of the double-where: zero rows must have ZERO gradient,
    # not NaN (jnp.linalg.norm's derivative at 0 is NaN)
    g = jax.grad(lambda v: jnp.sum(dgeo.safe_norm(v)))(vecs)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.allclose(g[1], 0.0)
    assert np.allclose(g[0], [0.6, 0.8, 0.0])


# -------------------------------------------------- triangle geometry basics
def test_interior_angles_equilateral_and_padding():
    positions, tri_rows, tri_valid = _single_triangle(EQUILATERAL)
    ang = np.asarray(dgeo.interior_angles(positions, tri_rows, tri_valid))
    assert np.allclose(ang[0], np.pi / 3.0, atol=1e-12)
    assert np.allclose(ang[1], 0.0)  # invalid row exactly zero


def test_interior_angles_right_triangle_sum_to_pi():
    pts = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    positions, tri_rows, tri_valid = _single_triangle(pts)
    ang = np.asarray(dgeo.interior_angles(positions, tri_rows, tri_valid))[0]
    assert np.isclose(ang[0], np.pi / 2.0, atol=1e-12)
    assert np.isclose(ang.sum(), np.pi, atol=1e-12)


def test_barycentric_vertex_areas_sum_to_total_area():
    positions, tri_rows, tri_valid = _single_triangle(EQUILATERAL)
    geo = dgeo.triangle_geometry(positions, tri_rows, tri_valid)
    areas = np.asarray(
        dgeo.barycentric_vertex_areas(geo, tri_rows, positions.shape[0])
    )
    total = np.sqrt(3.0) / 4.0
    assert np.isclose(areas[:3].sum(), total, atol=1e-12)
    assert np.allclose(areas[:3], total / 3.0)
    assert areas[3] == 0.0  # untouched padded vertex row


def test_edge_lengths_and_min_edge_length_mask_padding():
    positions = jnp.asarray(
        [[0.0, 0.0, 0.0], [3.0, 4.0, 0.0], [10.0, 0.0, 0.0]]
    )
    edge_rows = jnp.asarray([[0, 1], [0, 2], [0, 0]], dtype=jnp.int32)
    edge_valid = jnp.asarray([True, True, False])
    lengths = np.asarray(dgeo.edge_lengths(positions, edge_rows, edge_valid))
    assert np.allclose(lengths, [5.0, 10.0, 0.0])
    assert float(dgeo.min_edge_length(positions, edge_rows, edge_valid)) == 5.0


def test_body_volumes_unit_tetrahedron():
    """Divergence-theorem volume of the unit right tetrahedron = 1/6."""
    pts = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    # outward-oriented faces of the tet (0,1,2,3)
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], dtype=np.int32)
    tri_valid = jnp.ones(4, dtype=bool)
    tri_body = jnp.zeros(4, dtype=jnp.int32)
    vols = np.asarray(
        dgeo.body_volumes(jnp.asarray(pts), jnp.asarray(tris), tri_valid, tri_body, 2)
    )
    assert np.isclose(vols[0], 1.0 / 6.0, atol=1e-14)
    assert vols[1] == 0.0  # unused body slot


def test_p1_shape_gradients_reconstruct_linear_field():
    """For a P1 field f with in-plane gradient G, sum_i f_i g_i == G."""
    positions, tri_rows, tri_valid = _single_triangle(EQUILATERAL)
    geo = dgeo.triangle_geometry(positions, tri_rows, tri_valid)
    g = np.asarray(dgeo.p1_shape_gradients(geo))[0]  # (3 corners, 3 xyz)
    G = np.array([0.7, -1.3, 0.0])  # in the triangle plane (z=0)
    f = EQUILATERAL @ G
    recon = sum(f[i] * g[i] for i in range(3))
    assert np.allclose(recon, G, atol=1e-12)
    # partition of unity: constant fields have zero gradient
    assert np.allclose(g.sum(axis=0), 0.0, atol=1e-12)


def test_vertex_normals_flat_sheet_unit_z():
    pts = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.0]]
    )
    positions = jnp.asarray(pts)
    tri_rows = jnp.asarray([[0, 1, 2], [1, 3, 2]], dtype=jnp.int32)
    tri_valid = jnp.ones(2, dtype=bool)
    geo = dgeo.triangle_geometry(positions, tri_rows, tri_valid)
    vn = np.asarray(dgeo.vertex_normals(geo, tri_rows, tri_valid, 4))
    assert np.allclose(vn, np.array([[0.0, 0.0, 1.0]] * 4), atol=1e-12)


def test_project_to_tangent_orthogonal_and_idempotent():
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(size=(8, 3)))
    normals = rng.normal(size=(8, 3))
    normals = jnp.asarray(normals / np.linalg.norm(normals, axis=1, keepdims=True))
    out = dgeo.project_to_tangent(field, normals)
    dots = np.asarray(jnp.sum(out * normals, axis=1))
    assert np.allclose(dots, 0.0, atol=1e-12)
    out2 = dgeo.project_to_tangent(out, normals)
    assert np.allclose(np.asarray(out2), np.asarray(out), atol=1e-14)


def test_angle_defects_flat_interior_and_boundary_mask():
    """Flat fan around an interior vertex: defect 0; boundary rows zeroed."""
    center = np.array([[0.0, 0.0, 0.0]])
    ring = np.array(
        [[np.cos(t), np.sin(t), 0.0] for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)]
    )
    positions = jnp.asarray(np.vstack([center, ring]))
    tris = np.array([[0, 1 + i, 1 + (i + 1) % 6] for i in range(6)], dtype=np.int32)
    tri_valid = jnp.ones(6, dtype=bool)
    vertex_valid = jnp.ones(7, dtype=bool)
    boundary = jnp.asarray([False] + [True] * 6)
    defects = np.asarray(
        dgeo.angle_defects(positions, jnp.asarray(tris), tri_valid, vertex_valid, boundary)
    )
    assert np.isclose(defects[0], 0.0, atol=1e-12)  # flat interior vertex
    assert np.allclose(defects[1:], 0.0)  # boundary rows masked


def test_check_normal_rotation_accepts_small_and_rejects_flip():
    positions, tri_rows, tri_valid = _single_triangle(EQUILATERAL)
    small = positions + 1e-4
    assert bool(dgeo.check_normal_rotation(positions, small, tri_rows, tri_valid))
    # flip one corner through the plane far enough to rotate the normal > 0.5 rad
    flipped = positions.at[2, 2].set(5.0).at[2, 1].set(0.1)
    assert not bool(
        dgeo.check_normal_rotation(positions, flipped, tri_rows, tri_valid)
    )
    # collapsing the triangle to a segment must also fail
    collapsed = positions.at[2].set(positions[0])
    assert not bool(
        dgeo.check_normal_rotation(positions, collapsed, tri_rows, tri_valid)
    )


def test_directional_norm_gradient_falls_back_at_zero():
    """At |v|=0 the JVP direction must be the fallback dir, not NaN/zero.

    Parity: reference bending.py:155-160 resolves the |K| kink along the
    vertex normal so a flat membrane can buckle.
    """
    fallback = jnp.asarray([[0.0, 0.0, 1.0]])
    zero = jnp.zeros((1, 3))
    val, jvp = jax.jvp(
        lambda v: dgeo.directional_norm(v, fallback),
        (zero,),
        (jnp.asarray([[0.0, 0.0, 2.0]]),),
    )
    assert float(val[0]) == 0.0
    # moving along the fallback direction: d|v| = 2.0 (one-sided choice)
    assert np.isclose(float(jvp[0]), 2.0, atol=1e-12)
    # away from zero it is the plain norm derivative
    v = jnp.asarray([[3.0, 4.0, 0.0]])
    val2, jvp2 = jax.jvp(
        lambda x: dgeo.directional_norm(x, fallback), (v,), (jnp.asarray([[1.0, 0.0, 0.0]]),)
    )
    assert np.isclose(float(val2[0]), 5.0)
    assert np.isclose(float(jvp2[0]), 0.6, atol=1e-12)


def test_kink_threshold_tracks_dtype():
    assert dgeo.kink_threshold(jnp.float64) == pytest.approx(1e-15)
    assert dgeo.kink_threshold(jnp.float32) == pytest.approx(1e-5)


# ------------------------------------------------------- tangent transport
def test_minimal_rotation_transport_maps_src_to_dst_orthogonally():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(16, 3))
    src /= np.linalg.norm(src, axis=1, keepdims=True)
    dst = rng.normal(size=(16, 3))
    dst /= np.linalg.norm(dst, axis=1, keepdims=True)
    R = np.asarray(minimal_rotation_transport(jnp.asarray(src), jnp.asarray(dst)))
    # R is a proper rotation and takes src onto dst, row-wise
    for i in range(16):
        assert np.allclose(R[i] @ R[i].T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R[i]), 1.0, atol=1e-12)
        assert np.allclose(R[i] @ src[i], dst[i], atol=1e-12)


def test_minimal_rotation_transport_identity_and_antiparallel():
    src = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    dst = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    R = np.asarray(minimal_rotation_transport(src, dst))
    assert np.allclose(R[0], np.eye(3), atol=1e-12)
    # antiparallel fallback: still maps src -> dst (180-degree flip branch)
    assert np.allclose(R[1] @ np.asarray(src[1]), np.asarray(dst[1]), atol=1e-6)


# ------------------------------------------------------------ P1 divergence
def _flat_grid():
    """A 3x3 flat grid in z=0 triangulated into 8 triangles."""
    xs, ys = np.meshgrid(np.arange(3.0), np.arange(3.0), indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(9)], axis=1)
    tris = []
    for i in range(2):
        for j in range(2):
            a, b, c, d = 3 * i + j, 3 * i + j + 1, 3 * (i + 1) + j, 3 * (i + 1) + j + 1
            tris += [[a, b, c], [b, d, c]]
    return pts, np.asarray(tris, dtype=np.int32)


def test_p1_triangle_divergence_exact_for_linear_field():
    """t(x,y) = (a x, b y, 0) has constant divergence a+b; P1 is exact."""
    pts, tris = _flat_grid()
    a, b = 0.8, -0.3
    tilts = np.stack([a * pts[:, 0], b * pts[:, 1], np.zeros(9)], axis=1)
    div, area, _g = p1_triangle_divergence(
        jnp.asarray(pts), jnp.asarray(tilts), jnp.asarray(tris), jnp.ones(8, dtype=bool)
    )
    assert np.allclose(np.asarray(div), a + b, atol=1e-12)
    assert np.allclose(np.asarray(area), 0.5, atol=1e-12)


def test_p1_vertex_divergence_constant_field_is_zero():
    pts, tris = _flat_grid()
    tilts = np.tile(np.array([0.4, -0.2, 0.0]), (9, 1))
    vdiv = p1_vertex_divergence(
        jnp.asarray(pts), jnp.asarray(tilts), jnp.asarray(tris),
        jnp.ones(8, dtype=bool),
    )
    assert np.allclose(np.asarray(vdiv), 0.0, atol=1e-12)
