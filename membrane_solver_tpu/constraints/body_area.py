"""Hard body surface-area constraint.

Parity: reference ``modules/constraints/body_area.py`` — bodies with a
``target_area`` option contribute one KKT gradient row (the area gradient over
the body's triangles) and are geometrically projected by damped Lagrange
steps ``x -= lam * grad(A)`` until ``|A - A0| < 1e-12`` (max 20 iterations),
skipping fixed vertices in the update.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo

TOL = 1e-12
MAX_ITER = 20


def compile_topology(layout) -> dict:
    nb = len(layout.body_ids)
    target = np.zeros(max(nb, 1))
    has = np.zeros(max(nb, 1), dtype=bool)
    for slot, bid in enumerate(layout.body_ids):
        t = layout.mesh.bodies[bid].options.get("target_area")
        if t is not None:
            target[slot] = float(t)
            has[slot] = True
    return {
        "target": layout.pad_rows(target, layout.nb_cap, 0.0),
        "has": layout.pad_rows(has, layout.nb_cap, False),
    }


def _area_and_gradient(positions, topo, body_slot):
    in_body = (topo.tri_body == body_slot) & topo.tri_valid
    v0 = positions[topo.tri_rows[:, 0]]
    v1 = positions[topo.tri_rows[:, 1]]
    v2 = positions[topo.tri_rows[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    dbl = dgeo.safe_norm(n)
    ok = in_body & (dbl >= 1e-12)
    area = jnp.sum(jnp.where(ok, 0.5 * dbl, 0.0))
    n_hat = jnp.where(ok[:, None], n / jnp.maximum(dbl, 1e-12)[:, None], 0.0)
    g0 = 0.5 * jnp.cross(v1 - v2, n_hat)
    g1 = 0.5 * jnp.cross(v2 - v0, n_hat)
    g2 = 0.5 * jnp.cross(v0 - v1, n_hat)
    grad = dgeo.scatter_add_rows(g0, g1, g2, topo.tri_rows, positions.shape[0])
    return area, grad


def _active(topo):
    return topo.body_valid & topo.extras["constraint:body_area/has"]


def constraint_gradient_rows(state, topo, params):
    nb_cap = topo.body_valid.shape[0]
    active = _active(topo)

    def row(slot):
        _, grad = _area_and_gradient(state.positions, topo, slot)
        return grad * active[slot].astype(grad.dtype)

    return jnp.stack([row(s) for s in range(nb_cap)], axis=0)


def enforce(state, topo, params, context: str = "minimize"):
    active = _active(topo)
    targets = topo.extras["constraint:body_area/target"]
    movable = (~topo.fixed_mask)[:, None].astype(state.positions.dtype)
    nb_cap = topo.body_valid.shape[0]

    positions = state.positions
    for slot in range(nb_cap):
        target = targets[slot]
        is_active = active[slot]

        def one_iter(_, pos):
            area, grad = _area_and_gradient(pos, topo, slot)
            delta = area - target
            norm_sq = jnp.sum(grad * grad)
            lam = delta / (norm_sq + 1e-18)
            needs = is_active & (jnp.abs(delta) >= TOL) & (norm_sq >= 1e-18)
            return jnp.where(needs, pos - lam * grad * movable, pos)

        positions = jax.lax.fori_loop(0, MAX_ITER, one_iter, positions)

    return dataclasses.replace(state, positions=positions)
