"""Project all movable vertices onto a fixed plane.

Parity: reference ``modules/constraints/fixed_plane.py`` — plane from global
parameters ``fixed_plane_normal`` / ``fixed_plane_point`` (default z = 0).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def compile_topology(layout) -> dict:
    gp = layout.mesh.global_parameters
    normal = np.asarray(gp.get("fixed_plane_normal") or [0.0, 0.0, 1.0], dtype=float)
    nn = np.linalg.norm(normal)
    normal = normal / nn if nn > 1e-15 else np.array([0.0, 0.0, 1.0])
    point = np.asarray(gp.get("fixed_plane_point") or [0.0, 0.0, 0.0], dtype=float)
    return {"normal": normal, "point": point}


def enforce(state, topo, params, context: str = "minimize"):
    normal = jnp.asarray(topo.extras["constraint:fixed_plane/normal"], state.positions.dtype)
    point = jnp.asarray(topo.extras["constraint:fixed_plane/point"], state.positions.dtype)
    pos = state.positions
    dist = jnp.sum((pos - point) * normal, axis=1)
    proj = pos - dist[:, None] * normal
    movable = (~topo.fixed_mask) & topo.vertex_valid
    return dataclasses.replace(
        state, positions=jnp.where(movable[:, None], proj, pos)
    )
