"""Gaussian-curvature (Gaussian modulus) energy via Gauss-Bonnet.

Parity: reference ``modules/energy/gaussian_curvature.py`` — for closed
surfaces with constant modulus, E = 2 pi kappa_bar chi (topological constant,
zero shape gradient); for surfaces with boundary, E = kappa_bar * G with
G = sum of interior angle defects + boundary geodesic turning
(pi - angle sum per boundary vertex), which is again locally constant, so the
gradient is stopped exactly (the reference writes no gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo

USES_TILT = False
USES_TILT_LEAFLETS = False


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    mesh.build_connectivity_maps()
    has_boundary = any(len(f) == 1 for f in mesh.edge_to_facets.values())
    chi = len(mesh.vertices) - len(mesh.edges) + len(mesh.facets)
    return {
        "chi": np.asarray(chi, dtype=np.int32),
        "has_boundary": np.asarray(has_boundary),
    }


def gauss_bonnet_total(positions, topo):
    """G = sum interior defects (2pi - theta) + boundary turning (pi - theta)."""
    n_rows = positions.shape[0]
    ang = dgeo.interior_angles(positions, topo.tri_rows, topo.tri_valid)
    angle_sum = dgeo.scatter_add_rows(
        ang[:, 0], ang[:, 1], ang[:, 2], topo.tri_rows, n_rows
    )
    has_angles = angle_sum > 0
    interior = topo.vertex_valid & ~topo.boundary_vertex_mask & has_angles
    boundary = topo.vertex_valid & topo.boundary_vertex_mask & has_angles
    g_int = jnp.sum(jnp.where(interior, 2.0 * jnp.pi - angle_sum, 0.0))
    g_bnd = jnp.sum(jnp.where(boundary, jnp.pi - angle_sum, 0.0))
    return g_int + g_bnd


def energy(geo, state, topo, params):
    kappa_bar = params.get("gaussian_modulus", jnp.asarray(0.0))
    # trace-safe branch: has_boundary lives in topo.extras (a traced array
    # under jit), so select between the two locally-constant forms
    has_boundary = topo.extras["energy:gaussian_curvature/has_boundary"]
    chi = topo.extras["energy:gaussian_curvature/chi"].astype(state.positions.dtype)
    closed = 2.0 * jnp.pi * kappa_bar * chi
    g_total = jax.lax.stop_gradient(gauss_bonnet_total(state.positions, topo))
    return jnp.where(has_boundary, kappa_bar * g_total, closed)
