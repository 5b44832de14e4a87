"""Tilt smoothness (Dirichlet) energy on the cotan Laplacian.

Parity: reference ``modules/energy/tilt_smoothness.py``:

    E = (k_s / 4) * sum_tri [ c0 |t1 - t2|^2 + c1 |t2 - t0|^2 + c2 |t0 - t1|^2 ]

ambient_v1 model compares raw vectors; connection_v1 parallel-transports each
corner tilt into the triangle plane first (minimal-rotation transport).  The
reference provides exact tilt gradients and intentionally NO shape-gradient
contribution (tilt_smoothness.py:23-27), so the positions entering the cotan
weights are wrapped in stop_gradient here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo

USES_TILT = True


def minimal_rotation(t, a, b):
    """Minimal rotation taking unit vector a to unit vector b, applied to t."""
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1, keepdims=True)
    vxt = jnp.cross(v, t)
    vvt = jnp.sum(v * t, axis=-1, keepdims=True) * v
    denom = jnp.maximum(1.0 + c, 1e-12)
    return t * c + vxt + vvt / denom


def _transport_to_triangle(positions, tilts, topo):
    """connection_v1: rotate each corner tilt from its vertex plane to the tri plane."""
    n_rows = positions.shape[0]
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
    out = []
    for corner in range(3):
        rows = topo.tri_rows[:, corner]
        out.append(minimal_rotation(tilts[rows], vnormals[rows], geo.unit_normal))
    return out


def smoothness_energy(positions, tilts, topo, k_smooth, transport: str, tri_present=None):
    frozen = jax.lax.stop_gradient(positions)  # no shape gradient (see docstring)
    n_rows = frozen.shape[0]
    curv = dgeo.curvature_data(frozen, topo.tri_rows, topo.tri_valid, n_rows)
    c0, c1, c2 = curv.weights[:, 0], curv.weights[:, 1], curv.weights[:, 2]
    if transport == "connection_v1":
        t0, t1, t2 = _transport_to_triangle(frozen, tilts, topo)
    else:
        t0 = tilts[topo.tri_rows[:, 0]]
        t1 = tilts[topo.tri_rows[:, 1]]
        t2 = tilts[topo.tri_rows[:, 2]]
    d12 = t1 - t2
    d20 = t2 - t0
    d01 = t0 - t1
    per_tri = (
        c0 * jnp.sum(d12 * d12, axis=1)
        + c1 * jnp.sum(d20 * d20, axis=1)
        + c2 * jnp.sum(d01 * d01, axis=1)
    )
    keep = topo.tri_valid if tri_present is None else (topo.tri_valid & tri_present)
    return (k_smooth / 4.0) * jnp.sum(jnp.where(keep, per_tri, 0.0))


def make_energy(spec):
    transport = spec.option("tilt_transport_model", "ambient_v1")

    def fn(geo, state, topo, params):
        k = params.get(
            "tilt_smoothness_rigidity", params.get("tilt_smoothness_modulus", jnp.asarray(0.0))
        )
        return smoothness_energy(state.positions, state.tilts, topo, k, transport)

    return fn


def energy(geo, state, topo, params):
    k = params.get(
        "tilt_smoothness_rigidity", params.get("tilt_smoothness_modulus", jnp.asarray(0.0))
    )
    return smoothness_energy(state.positions, state.tilts, topo, k, "ambient_v1")
