"""Hard theta_B boundary condition on the inner-leaflet tilt: t_in . r_dir = thetaB.

Parity: reference ``modules/constraints/tilt_thetaB_boundary_in.py``:
group ring from ``tilt_thetaB_group_in`` (vertex options ``tilt_thetaB_group``
/ ``tilt_thetaB_group_in``); r_dir is the in-plane radial direction about
(``tilt_thetaB_center``, ``tilt_thetaB_normal`` or fitted plane normal),
tangent-projected against the live vertex normals.  One KKT tilt row per free
ring vertex ((rows, r_dir) on the in-leaflet block only); enforcement adds
(thetaB - t_in.r_dir) r_dir on the free rows.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo

_PREFIX = "constraint:tilt_thetaB_boundary_in"


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    gp = mesh.global_parameters
    empty = {
        "rows": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "center": np.zeros(3),
        "normal": np.array([0.0, 0.0, 1.0]),
    }
    group = gp.get("tilt_thetaB_group_in")
    if group is None or not str(group).strip():
        return empty
    group = str(group).strip()
    rows = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        # the reference matches the group against THREE tag keys — lanes tag
        # the disk ring via rim_slope_match_group while theta machinery reads
        # it too (reference tilt_thetaB_boundary_in._collect_group_rows:96-107)
        if (
            opts.get("rim_slope_match_group") == group
            or opts.get("tilt_thetaB_group") == group
            or opts.get("tilt_thetaB_group_in") == group
        ):
            rows.append(layout.row_of[int(vid)])
    if not rows:
        return empty
    center = np.asarray(gp.get("tilt_thetaB_center") or [0, 0, 0], dtype=float)
    raw_n = gp.get("tilt_thetaB_normal")
    if raw_n is not None:
        normal = np.asarray(raw_n, dtype=float).reshape(3)
        normal /= max(np.linalg.norm(normal), 1e-15)
    else:
        pos = np.array([mesh.vertices[int(layout.vertex_ids[r])].position for r in rows])
        centroid = pos.mean(axis=0)
        _, _, vh = np.linalg.svd(pos - centroid, full_matrices=False)
        normal = vh[-1]
    n = len(rows)
    nc = 1
    while nc < n:
        nc *= 2
    pad = layout.pad_rows
    return {
        "rows": pad(np.asarray(rows, dtype=np.int32), nc, 0),
        "valid": pad(np.ones(n, dtype=bool), nc, False),
        "center": center,
        "normal": normal,
    }


def _directions(positions, topo):
    x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
    rows = x("rows")
    valid = x("valid")
    dtype = positions.dtype
    center = jnp.asarray(x("center"), dtype)
    normal = jnp.asarray(x("normal"), dtype)
    pts = positions[rows]
    rel = pts - center
    rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
    r_len = jnp.linalg.norm(rel_p, axis=1)
    good = valid & (r_len > 1e-12)
    r_hat = jnp.where(good[:, None], rel_p / jnp.maximum(r_len, 1e-12)[:, None], 0.0)
    n_rows = positions.shape[0]
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    vnorm = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)[rows]
    r_dir = r_hat - jnp.sum(r_hat * vnorm, axis=1, keepdims=True) * vnorm
    nrm = jnp.linalg.norm(r_dir, axis=1)
    ok = good & (nrm > 1e-12)
    r_dir = jnp.where(ok[:, None], r_dir / jnp.maximum(nrm, 1e-12)[:, None], 0.0)
    return rows, r_dir, ok


def make_tilt_constraint_rows(spec):
    def fn(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return None
        positions = state.positions
        rows, r_dir, ok = _directions(positions, topo)
        ok = ok & ~topo.tilt_fixed_in_mask[rows]
        k = rows.shape[0]
        n_rows = positions.shape[0]
        dtype = positions.dtype
        idx = jnp.arange(k)
        gin = jnp.zeros((k, n_rows, 3), dtype).at[idx, rows].add(
            jnp.where(ok[:, None], r_dir, 0.0)
        )
        zeros = jnp.zeros((k, n_rows, 3), dtype)
        return jnp.stack([gin, zeros], axis=1)  # (k, 2=in/out, Nv, 3)

    return fn


def make_compact_tilt_rows(spec):
    """Compact form: each row is one radial direction at one rim vertex's
    inner-leaflet tilt (values (k,1,3), rows (k,1), leaflet (k,1)=0)."""

    def fn(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return None
        positions = state.positions
        rows, r_dir, ok = _directions(positions, topo)
        ok = ok & ~topo.tilt_fixed_in_mask[rows]
        vals = jnp.where(ok[:, None], r_dir, 0.0)[:, None, :]
        safe_rows = jnp.where(ok, rows, 0)[:, None]
        leaf = jnp.zeros(safe_rows.shape, jnp.int32)  # inner leaflet
        return vals, safe_rows, leaf

    return fn


def make_enforce_tilts(spec):
    def enforce(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return state
        positions = state.positions
        rows, r_dir, ok = _directions(positions, topo)
        ok = ok & ~topo.tilt_fixed_in_mask[rows]
        theta = params.get("tilt_thetaB_value", jnp.asarray(0.0))
        tilts_in = state.tilts_in
        t_rad = jnp.sum(tilts_in[rows] * r_dir, axis=1)
        delta = jnp.where(ok, theta - t_rad, 0.0)
        return dataclasses.replace(
            state, tilts_in=tilts_in.at[rows].add(delta[:, None] * r_dir)
        )

    return enforce


def make_frozen_enforce_tilts(spec):
    """Frozen split of :func:`make_enforce_tilts` (positions constant).

    The ring rows and tangent radial directions are position-only; the
    per-iteration work is one gather + one scatter on the ring rows with
    arithmetic identical to the full path.
    """

    def precompute(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return {}
        rows, r_dir, ok = _directions(state.positions, topo)
        ok = ok & ~topo.tilt_fixed_in_mask[rows]
        return {"rows": rows, "r_dir": r_dir, "ok": ok}

    def enforce(tin, tout, fr, topo, params):
        if not fr:
            return tin, tout
        theta = params.get("tilt_thetaB_value", jnp.asarray(0.0))
        rows, r_dir, ok = fr["rows"], fr["r_dir"], fr["ok"]
        t_rad = jnp.sum(tin[rows] * r_dir, axis=1)
        delta = jnp.where(ok, theta - t_rad, 0.0)
        return tin.at[rows].add(delta[:, None] * r_dir), tout

    return precompute, enforce
