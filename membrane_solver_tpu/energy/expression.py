"""User-defined expression energies over vertices/edges/facets/bodies.

Parity: reference ``modules/energy/expression.py`` — entities carrying an
``expression`` / ``energy_expression`` / ``expr`` option contribute

    E = sum_entities expr(x, y, z, <globals>) * measure

with measure selected by ``expression_measure``: "point" (vertices, default),
"length" (edges), "area" (facets), "volume" (bodies).  The reference walks
the AST per entity per evaluation and differentiates by finite differences;
here each distinct expression compiles ONCE into a traceable jnp function
(core/expr.compile_expr) evaluated vectorized on device, and the gradient is
exact AD.

Expression variables: x, y, z (vertex position / entity centroid) plus any
scalar global parameter forwarded in the params pytree.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.core.expr import compile_expr, expr_free_names

USES_TILT = False
USES_TILT_LEAFLETS = False

_EXPR_KEYS = ("expression", "energy_expression", "expr")
_DEFAULT_MEASURE = {0: "point", 1: "length", 2: "area", 3: "volume"}


def _expr_of(options) -> str | None:
    for key in _EXPR_KEYS:
        val = (options or {}).get(key)
        if val is not None:
            return str(val)
    return None


def _collect_groups(layout) -> Dict[tuple, List[int]]:
    mesh = layout.mesh
    groups: Dict[tuple, List[int]] = {}

    def note(kind, slot, options):
        expr = _expr_of(options)
        if expr is None or slot is None:
            return
        measure = str((options or {}).get("expression_measure") or _DEFAULT_MEASURE[kind])
        groups.setdefault((expr, measure, kind), []).append(slot)

    for vid, v in mesh.vertices.items():
        note(0, layout.row_of[int(vid)], v.options)
    for eid, e in mesh.edges.items():
        note(1, layout.edge_slot_of.get(int(eid)), e.options)
    for fid, f in mesh.facets.items():
        note(2, layout.tri_slot_of.get(int(fid)), f.options)
    for bid, b in mesh.bodies.items():
        note(3, layout.body_slot_of[int(bid)], b.options)
    return groups


def compile_static(layout):
    """Hashable (expr, measure, kind) table, index == group id."""
    return tuple(_collect_groups(layout).keys())


def compile_topology(layout) -> dict:
    groups = _collect_groups(layout)
    rows: List[int] = []
    gids: List[int] = []
    for g, slots in enumerate(groups.values()):
        rows.extend(slots)
        gids.extend([g] * len(slots))
    n = max(len(rows), 1)
    nc = 1
    while nc < n:
        nc *= 2
    return {
        "rows": layout.pad_rows(np.asarray(rows or [0], dtype=np.int32), nc, 0),
        "gid": layout.pad_rows(np.asarray(gids or [0], dtype=np.int32), nc, 0),
        "valid": layout.pad_rows(
            np.ones(len(rows), dtype=bool) if rows else np.zeros(1, dtype=bool), nc, False
        ),
    }


def make_energy(spec):
    exprs = spec.static_of("energy:expression", ())

    def fn(geo, state, topo, params):
        if not exprs:
            return jnp.asarray(0.0, state.positions.dtype)
        rows = topo.extras["energy:expression/rows"]
        gid = topo.extras["energy:expression/gid"]
        valid = topo.extras["energy:expression/valid"]
        dtype = state.positions.dtype
        total = jnp.asarray(0.0, dtype)
        for g, (expr, measure, kind) in enumerate(exprs):
            names = expr_free_names(expr)
            extra = sorted(n for n in names if n in params)
            compiled = compile_expr(expr, ["x", "y", "z"] + extra)
            mine = valid & (gid == g)
            if kind == 0:
                pts = state.positions[rows]
                weight = jnp.ones(rows.shape[0], dtype)
            elif kind == 1:
                t = state.positions[topo.edge_rows[rows][:, 0]]
                h = state.positions[topo.edge_rows[rows][:, 1]]
                pts = 0.5 * (t + h)
                from membrane_solver_tpu.device.geo import safe_norm

                weight = (
                    safe_norm(h - t) if measure == "length" else jnp.ones(rows.shape[0], dtype)
                )
            elif kind == 2:
                tri = topo.tri_rows[rows]
                pts = (
                    state.positions[tri[:, 0]]
                    + state.positions[tri[:, 1]]
                    + state.positions[tri[:, 2]]
                ) / 3.0
                weight = geo.area[rows] if measure == "area" else jnp.ones(rows.shape[0], dtype)
            else:
                from membrane_solver_tpu.device import geo as dgeo

                nb_cap = topo.body_valid.shape[0]
                vols = dgeo.body_volumes(
                    state.positions, topo.tri_rows, topo.tri_valid, topo.tri_body, nb_cap
                )
                pts = jnp.zeros((rows.shape[0], 3), dtype)
                weight = (
                    vols[rows] if measure == "volume" else jnp.ones(rows.shape[0], dtype)
                )
            args = [pts[:, 0], pts[:, 1], pts[:, 2]] + [params[n] for n in extra]
            vals = compiled(*args)
            total = total + jnp.sum(jnp.where(mine, vals * weight, 0.0))
        return total

    return fn


def energy(geo, state, topo, params):  # breakdown fallback (no static table)
    return jnp.asarray(0.0, state.positions.dtype)
