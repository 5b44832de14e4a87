"""Hard global surface-area constraint.

Parity: reference ``modules/constraints/global_area.py`` — when the global
parameter ``target_surface_area`` is set, project positions along the total
area gradient until |A - A0| < 1e-12 (3 iterations), skipping fixed vertices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo

TOL = 1e-12
MAX_ITER = 3


def _total_area_and_gradient(positions, topo):
    v0 = positions[topo.tri_rows[:, 0]]
    v1 = positions[topo.tri_rows[:, 1]]
    v2 = positions[topo.tri_rows[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    dbl = dgeo.safe_norm(n)
    ok = topo.tri_valid & (dbl >= 1e-12)
    area = jnp.sum(jnp.where(ok, 0.5 * dbl, 0.0))
    n_hat = jnp.where(ok[:, None], n / jnp.maximum(dbl, 1e-12)[:, None], 0.0)
    g0 = 0.5 * jnp.cross(v1 - v2, n_hat)
    g1 = 0.5 * jnp.cross(v2 - v0, n_hat)
    g2 = 0.5 * jnp.cross(v0 - v1, n_hat)
    grad = dgeo.scatter_add_rows(g0, g1, g2, topo.tri_rows, positions.shape[0])
    return area, grad


def enforce(state, topo, params, context: str = "minimize"):
    target = params.get("target_surface_area")
    if target is None:
        return state
    movable = (~topo.fixed_mask)[:, None].astype(state.positions.dtype)

    def one_iter(_, pos):
        area, grad = _total_area_and_gradient(pos, topo)
        delta = area - target
        norm_sq = jnp.sum(grad * grad)
        lam = delta / (norm_sq + 1e-18)
        needs = (jnp.abs(delta) >= TOL) & (norm_sq >= 1e-18)
        return jnp.where(needs, pos - lam * grad * movable, pos)

    positions = jax.lax.fori_loop(0, MAX_ITER, one_iter, state.positions)
    return dataclasses.replace(state, positions=positions)
