"""Hard rim director continuity: in-plane tilt_in == tilt_out on a tagged ring.

Parity: reference ``modules/constraints/tilt_leaflet_match_rim.py`` — for
vertices tagged ``tilt_leaflet_match_group`` (group name from the same gp
key), equality of both in-plane components in the rim's fitted tangent basis
(u, v).  KKT rows: per basis vector one joint row with +dvec on the in-leaflet
block and -dvec on the out-leaflet block at every ring row.  Enforcement
projects per vertex to the average (or the ``in_to_out`` / ``out_to_in``
target from ``tilt_leaflet_match_mode``), honoring per-field fixed flags.
The basis is frozen at compile time (the reference also treats it as
position-independent for gradients).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

_PREFIX = "constraint:tilt_leaflet_match_rim"


def _basis_from_points(pos: np.ndarray):
    centroid = pos.mean(axis=0)
    _, _, vh = np.linalg.svd(pos - centroid, full_matrices=False)
    normal = vh[-1]
    trial = np.array([1.0, 0.0, 0.0])
    if abs(float(trial @ normal)) > 0.9:
        trial = np.array([0.0, 1.0, 0.0])
    u = trial - float(trial @ normal) * normal
    u /= max(np.linalg.norm(u), 1e-15)
    v = np.cross(normal, u)
    v /= max(np.linalg.norm(v), 1e-15)
    return u, v


def compile_static(layout):
    gp = layout.mesh.global_parameters
    mode = str(gp.get("tilt_leaflet_match_mode") or "average").strip().lower()
    if mode not in {"average", "in_to_out", "out_to_in"}:
        mode = "average"
    return (mode,)


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    gp = mesh.global_parameters
    empty = {
        "rows": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "u": np.array([1.0, 0.0, 0.0]),
        "v": np.array([0.0, 1.0, 0.0]),
    }
    group = gp.get("tilt_leaflet_match_group")
    if group is None or not str(group).strip():
        return empty
    group = str(group).strip()
    rows = [
        layout.row_of[int(vid)]
        for vid in sorted(mesh.vertices)
        if (mesh.vertices[vid].options or {}).get("tilt_leaflet_match_group") == group
    ]
    if not rows:
        return empty
    pos = np.array([mesh.vertices[int(layout.vertex_ids[r])].position for r in rows])
    u, v = _basis_from_points(pos)
    n = len(rows)
    nc = 1
    while nc < n:
        nc *= 2
    pad = layout.pad_rows
    return {
        "rows": pad(np.asarray(rows, dtype=np.int32), nc, 0),
        "valid": pad(np.ones(n, dtype=bool), nc, False),
        "u": u,
        "v": v,
    }


def make_tilt_constraint_rows(spec):
    def fn(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return None
        x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
        rows = x("rows")
        valid = x("valid")
        dtype = state.positions.dtype
        n_rows = state.positions.shape[0]
        out = []
        for key in ("u", "v"):
            dvec = jnp.asarray(x(key), dtype)
            g = jnp.zeros((n_rows, 3), dtype).at[rows].add(
                jnp.where(valid[:, None], dvec, 0.0)
            )
            out.append(jnp.stack([g, -g], axis=0))  # (2=in/out, Nv, 3)
        return jnp.stack(out, axis=0)

    return fn


def make_enforce_tilts(spec):
    mode = spec.static_of(_PREFIX, ("average",))[0]

    def enforce(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return state
        x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
        rows = x("rows")
        valid = x("valid")
        dtype = state.positions.dtype
        u = jnp.asarray(x("u"), dtype)
        v = jnp.asarray(x("v"), dtype)
        fixed_in = topo.tilt_fixed_in_mask[rows]
        fixed_out = topo.tilt_fixed_out_mask[rows]

        tin = state.tilts_in
        tout = state.tilts_out
        din = jnp.stack(
            [jnp.sum(tin[rows] * u, axis=1), jnp.sum(tin[rows] * v, axis=1)], axis=1
        )
        dout = jnp.stack(
            [jnp.sum(tout[rows] * u, axis=1), jnp.sum(tout[rows] * v, axis=1)], axis=1
        )
        if mode == "in_to_out":
            target = din
        elif mode == "out_to_in":
            target = dout
        else:
            target = 0.5 * (din + dout)
            target = jnp.where(fixed_in[:, None], din, target)
            target = jnp.where(fixed_out[:, None], dout, target)
        both_fixed = fixed_in & fixed_out
        ok_in = valid & ~fixed_in & ~both_fixed
        ok_out = valid & ~fixed_out & ~both_fixed
        delta_in = (target[:, 0] - din[:, 0])[:, None] * u + (
            target[:, 1] - din[:, 1]
        )[:, None] * v
        delta_out = (target[:, 0] - dout[:, 0])[:, None] * u + (
            target[:, 1] - dout[:, 1]
        )[:, None] * v
        tin = tin.at[rows].add(jnp.where(ok_in[:, None], delta_in, 0.0))
        tout = tout.at[rows].add(jnp.where(ok_out[:, None], delta_out, 0.0))
        return dataclasses.replace(state, tilts_in=tin, tilts_out=tout)

    return enforce
