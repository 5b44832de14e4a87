"""Hard perimeter (loop length) constraint.

Parity: reference ``modules/constraints/perimeter.py`` — the global parameter
``perimeter_constraints`` lists dicts ``{edges: [signed ids], target_perimeter:
float}``; each loop's total length is projected to the target by Lagrange
steps along the length gradient (3 iterations, tol 1e-10), skipping fixed
vertices; geometric enforcement only (no KKT rows in the reference).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo

TOL = 1e-10
MAX_ITER = 3


def compile_topology(layout) -> dict:
    specs = layout.mesh.global_parameters.get("perimeter_constraints", []) or []
    pairs = []  # (loop_id, tail_row, head_row)
    targets = []
    for loop_id, spec in enumerate(specs):
        edges = spec.get("edges")
        target = spec.get("target_perimeter")
        if not edges or target is None:
            targets.append(0.0)
            continue
        targets.append(float(target))
        for signed in edges:
            edge = layout.mesh.edges[abs(int(signed))]
            pairs.append(
                (loop_id, layout.row_of[edge.tail_index], layout.row_of[edge.head_index])
            )
    m = max(len(pairs), 1)
    loop_of = np.zeros(m, dtype=np.int32)
    rows = np.zeros((m, 2), dtype=np.int32)
    valid = np.zeros(m, dtype=bool)
    for i, (lid, t, h) in enumerate(pairs):
        loop_of[i], rows[i, 0], rows[i, 1], valid[i] = lid, t, h, True
    mc = 1
    while mc < m:
        mc *= 2
    return {
        "loop": layout.pad_rows(loop_of, mc, 0),
        "rows": layout.pad_rows(rows, mc, 0),
        "valid": layout.pad_rows(valid, mc, False),
        "target": np.asarray(targets if targets else [0.0]),
        "n_loops": np.asarray(max(len(targets), 1), dtype=np.int32),
    }


def _x(topo, key):
    return topo.extras[f"constraint:perimeter/{key}"]


def enforce(state, topo, params, context: str = "minimize"):
    from membrane_solver_tpu.constraints import any_live

    valid = _x(topo, "valid")
    if not any_live(valid):
        return state
    rows = _x(topo, "rows")
    loop = _x(topo, "loop")
    targets = _x(topo, "target")
    n_loops = targets.shape[0]
    movable = (~topo.fixed_mask)[:, None].astype(state.positions.dtype)
    positions = state.positions

    for lid in range(n_loops):
        mine = valid & (loop == lid)
        target = targets[lid]

        def one_iter(_, pos):
            vecs = pos[rows[:, 1]] - pos[rows[:, 0]]
            lengths = dgeo.safe_norm(vecs, eps=1e-12)
            perimeter = jnp.sum(jnp.where(mine, lengths, 0.0))
            dirs = jnp.where(
                (mine & (lengths > 0))[:, None],
                vecs / jnp.maximum(lengths, 1e-12)[:, None],
                0.0,
            )
            grad = jnp.zeros_like(pos)
            grad = grad.at[rows[:, 0]].add(-dirs)
            grad = grad.at[rows[:, 1]].add(dirs)
            delta = perimeter - target
            norm_sq = jnp.sum(grad * grad)
            lam = delta / (norm_sq + 1e-18)
            needs = (jnp.abs(delta) >= TOL) & (norm_sq >= 1e-18)
            return jnp.where(needs, pos - lam * grad * movable, pos)

        positions = jax.lax.fori_loop(0, MAX_ITER, one_iter, positions)

    return dataclasses.replace(state, positions=positions)
