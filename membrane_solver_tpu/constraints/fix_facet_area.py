"""Hard per-facet area constraint (damped Lagrange with clamped steps).

Parity: reference ``modules/constraints/fix_facet_area.py`` — facets with a
``target_area`` option are projected toward it: Newton step
``x -= lam * grad(A)`` with lam halved until (a) no vertex moves more than
0.1x the facet diameter and (b) the area error strictly decreases (12
backtracking trials, 5 outer iterations, tol 1e-12); fixed vertices never
move; facets are processed sequentially (they share vertices).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

TOL = 1e-12
MAX_OUTER = 5
MAX_BACKTRACK = 12


def compile_topology(layout) -> dict:
    slots = []
    targets = []
    for fid, slot in layout.tri_slot_of.items():
        t = layout.mesh.facets[fid].options.get("target_area")
        if t is not None:
            slots.append(slot)
            targets.append(float(t))
    k = max(len(slots), 1)
    kc = 1
    while kc < k:
        kc *= 2
    slot_arr = np.zeros(k, dtype=np.int32)
    target_arr = np.zeros(k)
    valid = np.zeros(k, dtype=bool)
    for i, (s, t) in enumerate(zip(slots, targets)):
        slot_arr[i], target_arr[i], valid[i] = s, t, True
    return {
        "slots": layout.pad_rows(slot_arr, kc, 0),
        "target": layout.pad_rows(target_arr, kc, 0.0),
        "valid": layout.pad_rows(valid, kc, False),
    }


def _facet_area_grad(pos, rows):
    """Area + per-corner gradients of one triangle (rows: (3,) int)."""
    v0, v1, v2 = pos[rows[0]], pos[rows[1]], pos[rows[2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    dbl = jnp.sqrt(jnp.maximum(jnp.sum(n * n), 1e-30))
    area = 0.5 * dbl
    n_hat = n / dbl
    g = jnp.stack(
        [
            0.5 * jnp.cross(v1 - v2, n_hat),
            0.5 * jnp.cross(v2 - v0, n_hat),
            0.5 * jnp.cross(v0 - v1, n_hat),
        ]
    )
    return area, g


def enforce(state, topo, params, context: str = "minimize"):
    from membrane_solver_tpu.constraints import any_live

    valid = topo.extras["constraint:fix_facet_area/valid"]
    if not any_live(valid):
        return state
    slots = topo.extras["constraint:fix_facet_area/slots"]
    targets = topo.extras["constraint:fix_facet_area/target"]
    k = slots.shape[0]

    def per_facet(i, positions):
        rows = topo.tri_rows[slots[i]]
        target = targets[i]
        active = valid[i] & topo.tri_valid[slots[i]]
        movable = (~topo.fixed_mask[rows]).astype(positions.dtype)[:, None]

        pts = positions[rows]
        dists = jnp.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)
        diameter = jnp.max(dists)
        max_move = jnp.where(diameter > 0, 0.1 * diameter, 1e-3)

        def outer(j, carry):
            positions, stop = carry
            area, g = _facet_area_grad(positions, rows)
            delta = area - target
            norm_sq = jnp.sum(g * g)
            lam0 = delta / (norm_sq + 1e-18)
            done = stop | (jnp.abs(delta) < TOL) | (norm_sq < 1e-18)

            def backtrack(t, bcarry):
                lam, applied, success = bcarry
                disp = -lam * g * movable
                too_far = jnp.max(jnp.linalg.norm(disp, axis=1)) > max_move
                trial = positions.at[rows].add(jnp.where(success[None, None], 0.0, disp))
                new_area, _ = _facet_area_grad(trial, rows)
                better = jnp.abs(new_area - target) < jnp.abs(delta)
                accept = (~success) & (~too_far) & better
                return (
                    jnp.where(accept | success, lam, lam * 0.5),
                    jnp.where(accept, trial, applied),
                    success | accept,
                )

            lam, applied, success = jax.lax.fori_loop(
                0, MAX_BACKTRACK, backtrack, (lam0, positions, jnp.asarray(False))
            )
            new_positions = jnp.where(done | ~active, positions, jnp.where(success, applied, positions))
            new_stop = done | ~success
            return new_positions, new_stop

        positions, _ = jax.lax.fori_loop(
            0, MAX_OUTER, outer, (positions, ~active)
        )
        return positions

    positions = jax.lax.fori_loop(0, k, per_facet, state.positions)
    return dataclasses.replace(state, positions=positions)
