"""Expression-based hard constraints.

Parity: reference ``modules/constraints/expression.py`` — entities with
``constraint_expression`` (+ ``constraint_target``) contribute one KKT row
(the expression gradient over the entity's vertices) and are geometrically
projected by Newton steps ``x -= (g(x) - target) * grad g / |grad g|^2``.

Each distinct expression compiles once into a traceable jnp function; the
entity value/gradient machinery reuses the expression-energy device layout
(vertex point / edge length / facet area / body volume measures).  Gradients
are exact AD (the reference uses finite differences with eps=1e-6).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.core.expr import compile_expr, expr_free_names

TOL = 1e-12  # reference enforce_constraint tol
MAX_ITER = 5  # reference enforce_constraint max_iter


def _spec_of(options):
    opts = options or {}
    expr = opts.get("constraint_expression") or opts.get("expression_constraint")
    target = opts.get("constraint_target")
    if target is None:
        target = opts.get("expression_target")
    if expr is None or target is None:
        return None
    return str(expr), float(target)


def _collect(layout):
    """(expr, target, kind, slot) tuples for all constrained entities."""
    mesh = layout.mesh
    out = []
    for vid, v in mesh.vertices.items():
        spec = _spec_of(v.options)
        if spec:
            out.append((spec[0], spec[1], 0, layout.row_of[int(vid)]))
    for eid, e in mesh.edges.items():
        spec = _spec_of(e.options)
        slot = layout.edge_slot_of.get(int(eid))
        if spec and slot is not None:
            out.append((spec[0], spec[1], 1, slot))
    for fid, f in mesh.facets.items():
        spec = _spec_of(f.options)
        slot = layout.tri_slot_of.get(int(fid))
        if spec and slot is not None:
            out.append((spec[0], spec[1], 2, slot))
    return out


def compile_static(layout):
    return tuple((e, t, k) for (e, t, k, _s) in _collect(layout))


def compile_topology(layout) -> dict:
    entries = _collect(layout)
    slots = np.asarray([s for (_e, _t, _k, s) in entries] or [0], dtype=np.int32)
    return {"slots": slots}


def _entity_value_fn(expr: str, kind: int, topo, params):
    """positions -> scalar expression value for one entity."""
    names = expr_free_names(expr)
    extra = sorted(n for n in names if n in params)
    compiled = compile_expr(expr, ["x", "y", "z"] + extra)

    def value(positions, slot):
        if kind == 0:
            p = positions[slot]
        elif kind == 1:
            rows = topo.edge_rows[slot]
            p = 0.5 * (positions[rows[0]] + positions[rows[1]])
        else:
            rows = topo.tri_rows[slot]
            p = (positions[rows[0]] + positions[rows[1]] + positions[rows[2]]) / 3.0
        return compiled(p[0], p[1], p[2], *[params[n] for n in extra])

    return value


def _make_rows(spec_table, topo, params, positions):
    slots = topo.extras["constraint:expression/slots"]
    rows = []
    for i, (expr, _target, kind) in enumerate(spec_table):
        value = _entity_value_fn(expr, kind, topo, params)
        g = jax.grad(lambda p: value(p, slots[i]))(positions)
        rows.append(g)
    return rows


def make_constraint_gradient_rows(spec):
    table = spec.static_of("constraint:expression", ())

    def fn(state, topo, params):
        if not table:
            return None
        return jnp.stack(_make_rows(table, topo, params, state.positions))

    return fn


def make_enforce(spec):
    table = spec.static_of("constraint:expression", ())

    def enforce(state, topo, params, context: str = "minimize"):
        if not table:
            return state
        import dataclasses

        positions = state.positions
        slots = topo.extras["constraint:expression/slots"]
        movable = (~topo.fixed_mask)[:, None].astype(positions.dtype)
        for i, (expr, target, kind) in enumerate(table):
            value = _entity_value_fn(expr, kind, topo, params)

            def one_iter(_, pos):
                val, g = jax.value_and_grad(lambda p: value(p, slots[i]))(pos)
                delta = val - target
                norm_sq = jnp.sum(g * g)
                lam = delta / (norm_sq + 1e-18)
                needs = (jnp.abs(delta) >= TOL) & (norm_sq >= 1e-18)
                return jnp.where(needs, pos - lam * g * movable, pos)

            positions = jax.lax.fori_loop(0, MAX_ITER, one_iter, positions)
        return dataclasses.replace(state, positions=positions)

    return enforce
