"""Hard volume constraint (Lagrange KKT projection + geometric projection).

Parity: reference ``modules/constraints/volume.py``:
- ``constraint_gradients_array`` -> one dense volume gradient per body with a
  target volume (KKT rows), active only in lagrange mode;
- ``enforce_constraint`` -> iterative Lagrange projection
  ``x -= lam * grad(V)`` until ``|V - V0| < tol``; 3 iterations in the
  minimize context, 12 in finalize/mesh-operation contexts
  (volume.py:100-104); the update skips fixed vertices while the
  normalization uses all rows (volume.py:132-145).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo

TOL = 1e-12
MAX_ITER_MINIMIZE = 3
MAX_ITER_STRONG = 12


def _body_active(topo):
    return topo.body_valid & topo.body_has_target


def _volume_and_gradient(positions, topo, body_slot):
    """Volume of one body slot and its dense gradient over all vertex rows."""
    in_body = (topo.tri_body == body_slot) & topo.tri_valid
    v0 = positions[topo.tri_rows[:, 0]]
    v1 = positions[topo.tri_rows[:, 1]]
    v2 = positions[topo.tri_rows[:, 2]]
    m = in_body.astype(positions.dtype)[:, None]
    c12 = jnp.cross(v1, v2)
    vol = jnp.sum(jnp.where(in_body, jnp.sum(c12 * v0, axis=1), 0.0)) / 6.0
    g0 = c12 * (m / 6.0)
    g1 = jnp.cross(v2, v0) * (m / 6.0)
    g2 = jnp.cross(v0, v1) * (m / 6.0)
    grad = dgeo.scatter_add_rows(g0, g1, g2, topo.tri_rows, positions.shape[0])
    return vol, grad


def constraint_gradient_rows(state, topo, params):
    """(nb_cap, Nv, 3) volume gradients; zero rows for inactive slots."""
    nb_cap = topo.body_valid.shape[0]
    active = _body_active(topo)

    def row(slot):
        _, grad = _volume_and_gradient(state.positions, topo, slot)
        return grad * active[slot].astype(grad.dtype)

    return jnp.stack([row(s) for s in range(nb_cap)], axis=0)


def enforce(state, topo, params, context: str = "minimize"):
    """Geometric volume projection for every constrained body."""
    max_iter = MAX_ITER_MINIMIZE if context == "minimize" else MAX_ITER_STRONG
    active = _body_active(topo)
    movable = (~topo.fixed_mask)[:, None].astype(state.positions.dtype)
    nb_cap = topo.body_valid.shape[0]

    positions = state.positions
    for slot in range(nb_cap):  # static, tiny
        target = topo.body_target_volume[slot]
        is_active = active[slot]

        def one_iter(_, pos):
            vol, grad = _volume_and_gradient(pos, topo, slot)
            delta = vol - target
            norm_sq = jnp.sum(grad * grad) + 1e-12
            lam = delta / norm_sq
            needs = is_active & (jnp.abs(delta) >= TOL)
            return jnp.where(needs, pos - lam * grad * movable, pos)

        positions = jax.lax.fori_loop(0, max_iter, one_iter, positions)

    return dataclasses.replace(state, positions=positions)
