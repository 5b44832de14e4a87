"""Hard rim-matching constraint: outer-leaflet tilt vs slope (gamma = 0).

Parity: reference ``modules/constraints/rim_slope_match_out.py`` family in
its default ``pointwise_radial_v1`` mode with equal-count rings:

    phi_i = (h_out_i - h_rim_i) / (r_out_i - r_rim_i)      (slope per rim vertex)
    t_out . r_dir_i = phi_i                                 (outer condition)
    t_in  . r_dir_i = theta_B - phi_i                       (inner condition,
                                                             scalar theta law)

with r_dir_i the rim vertex's tangent-projected radial direction and h/r
heights/radii about (center, normal).  Three hooks:

- ``enforce_tilts``: kinematic tilt projection of both conditions
  (rim_slope_match_out.py:61-296, pointwise branch);
- ``make_tilt_constraint_rows``: stacked (in, out) gradient row pairs for the
  leaflet-tilt KKT projection (rim_slope_match_gradients.py:446-589) — per rim
  vertex an out-row (sqrt(w_i) r_dir at the rim row) and an in-row
  (sqrt(w_i) r_dir at the rim row, minus sqrt(w_i) disk_r_hat at the matched
  disk-ring row when disk-theta targeting is off);
- ``make_constraint_gradient_rows``: shape rows tying rim/outer heights
  (rim_slope_match_gradients.py:317-407): per rim vertex
  +-sqrt(w_i) inv_dr_i n_hat at the rim row and the opposite sign at the
  outer row, one row per condition.

Ring ordering (angular, about center/normal) is fixed at compile time; the
slope, weights, and radial directions are computed from live positions on
device.  Unequal ring counts (arc-length interpolation) are not yet
supported and fail loudly at compile.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo


def _group_rows(layout, group):
    mesh = layout.mesh
    rows = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        if str(opts.get("rim_slope_match_group") or "") == str(group):
            rows.append(layout.row_of[int(vid)])
    return rows


def _order_ring(layout, rows, center, normal):
    pos = np.array(
        [layout.mesh.vertices[int(layout.vertex_ids[r])].position for r in rows]
    )
    rel = pos - center
    rel -= np.outer(rel @ normal, normal)
    trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
    u = trial - (trial @ normal) * normal
    u /= max(np.linalg.norm(u), 1e-15)
    v = np.cross(normal, u)
    order = np.argsort(np.arctan2(rel @ v, rel @ u))
    return [rows[i] for i in order]


def compile_static(layout):
    """Hashable flags: whether the constraint is active and has a disk ring."""
    gp = layout.mesh.global_parameters
    mode = str(gp.get("rim_slope_match_mode") or "pointwise_radial_v1").lower()
    group = gp.get("rim_slope_match_group")
    outer_group = gp.get("rim_slope_match_outer_group")
    disk_group = gp.get("rim_slope_match_disk_group")
    if mode != "pointwise_radial_v1" or group is None or outer_group is None:
        return ("inactive",)
    rim = _group_rows(layout, group)
    outer = _group_rows(layout, outer_group)
    disk = _group_rows(layout, disk_group) if disk_group is not None else []
    if not rim or not outer:
        return ("inactive",)
    return ("active", bool(disk))


def compile_topology(layout) -> dict:
    gp = layout.mesh.global_parameters
    mode = str(gp.get("rim_slope_match_mode") or "pointwise_radial_v1").lower()
    group = gp.get("rim_slope_match_group")
    outer_group = gp.get("rim_slope_match_outer_group")
    disk_group = gp.get("rim_slope_match_disk_group")
    center = np.asarray(gp.get("rim_slope_match_center") or [0, 0, 0], dtype=float)
    normal = np.asarray(gp.get("rim_slope_match_normal") or [0, 0, 1], dtype=float)
    normal /= max(np.linalg.norm(normal), 1e-15)
    theta_param = gp.get("rim_slope_match_thetaB_param")

    empty = {
        "rim": np.zeros(1, dtype=np.int32),
        "outer": np.zeros(1, dtype=np.int32),
        "disk": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "has_disk": np.asarray(False),
        "center": center,
        "normal": normal,
    }
    if mode != "pointwise_radial_v1" or group is None or outer_group is None:
        if mode != "pointwise_radial_v1":
            raise NotImplementedError(
                f"rim_slope_match mode {mode!r} is not supported yet "
                "(pointwise_radial_v1 only)"
            )
        return empty

    rim = _order_ring(layout, _group_rows(layout, group), center, normal)
    outer = _order_ring(layout, _group_rows(layout, outer_group), center, normal)
    disk = (
        _order_ring(layout, _group_rows(layout, disk_group), center, normal)
        if disk_group is not None
        else []
    )
    if not rim or not outer:
        return empty
    if len(rim) != len(outer) or (disk and len(disk) != len(rim)):
        raise NotImplementedError(
            "rim_slope_match with unequal ring counts (arc-length interpolation) "
            f"is not supported yet: rim={len(rim)} outer={len(outer)} disk={len(disk)}"
        )
    n = len(rim)
    nc = 1
    while nc < n:
        nc *= 2
    pad = layout.pad_rows
    return {
        "rim": pad(np.asarray(rim, dtype=np.int32), nc, 0),
        "outer": pad(np.asarray(outer, dtype=np.int32), nc, 0),
        "disk": pad(np.asarray(disk or [0] * n, dtype=np.int32), nc, 0),
        "valid": pad(np.ones(n, dtype=bool), nc, False),
        "has_disk": np.asarray(bool(disk)),
        "center": center,
        "normal": normal,
        "theta_is_param": np.asarray(theta_param is not None),
    }


def _x(topo, key):
    return topo.extras[f"constraint:rim_slope_match_out/{key}"]


def matching_data(positions, topo, params):
    """(valid, phi, inv_dr, r_dir, weights) computed from live positions."""
    dtype = positions.dtype
    rim = _x(topo, "rim")
    outer = _x(topo, "outer")
    ring_valid = _x(topo, "valid")
    center = jnp.asarray(_x(topo, "center"), dtype)
    normal = jnp.asarray(_x(topo, "normal"), dtype)

    rim_pos = positions[rim]
    outer_pos = positions[outer]
    rel = rim_pos - center
    rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
    r_len = jnp.linalg.norm(rel_p, axis=1)
    good = ring_valid & (r_len > 1e-12)
    r_hat = jnp.where(good[:, None], rel_p / jnp.maximum(r_len, 1e-12)[:, None], 0.0)

    h_rim = jnp.sum((rim_pos - center) * normal, axis=1)
    h_out = jnp.sum((outer_pos - center) * normal, axis=1)
    rel_o = outer_pos - center
    rel_op = rel_o - jnp.sum(rel_o * normal, axis=1, keepdims=True) * normal
    r_out = jnp.linalg.norm(rel_op, axis=1)
    dr = r_out - r_len
    valid = good & (jnp.abs(dr) > 1e-8)
    inv_dr = jnp.where(valid, 1.0 / jnp.where(valid, dr, 1.0), 0.0)
    phi = jnp.where(valid, (h_out - h_rim) * inv_dr, 0.0)

    # arc-length weights on the rim ring (live rows only)
    k = rim.shape[0]
    idx = jnp.arange(k)
    n_live = jnp.sum(ring_valid.astype(jnp.int32))
    nxt = jnp.where(idx + 1 >= n_live, 0, idx + 1)
    prv = jnp.where(idx - 1 < 0, n_live - 1, idx - 1)
    l_next = jnp.linalg.norm(rim_pos[nxt] - rim_pos, axis=1)
    l_prev = jnp.linalg.norm(rim_pos - rim_pos[prv], axis=1)
    weights = jnp.where(valid, 0.5 * (l_next + l_prev), 0.0)
    return valid, phi, inv_dr, r_hat, weights, normal


def _tangent_radial(r_hat, vnormals, rows):
    n = vnormals[rows]
    r_dir = r_hat - jnp.sum(r_hat * n, axis=1, keepdims=True) * n
    norm = jnp.linalg.norm(r_dir, axis=1)
    ok = norm > 1e-12
    return jnp.where(ok[:, None], r_dir / jnp.maximum(norm, 1e-12)[:, None], 0.0), ok


def enforce_tilts(state, topo, params):
    """Project rim tilts onto the matching conditions (pointwise, scalar theta)."""
    positions = state.positions
    valid, phi, _inv_dr, r_hat, _w, _normal = matching_data(positions, topo, params)
    rim = _x(topo, "rim")
    n_rows = positions.shape[0]
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
    r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
    use = valid & dir_ok

    theta_B = params.get("tilt_thetaB_value", jnp.asarray(0.0))

    tilts_out = state.tilts_out
    ok_out = use & ~topo.tilt_fixed_out_mask[rim]
    t_out_rad = jnp.sum(tilts_out[rim] * r_dir, axis=1)
    delta_out = jnp.where(ok_out, phi - t_out_rad, 0.0)
    tilts_out = tilts_out.at[rim].add(delta_out[:, None] * r_dir)

    tilts_in = state.tilts_in
    ok_in = use & ~topo.tilt_fixed_in_mask[rim]
    t_in_rad = jnp.sum(tilts_in[rim] * r_dir, axis=1)
    delta_in = jnp.where(ok_in, (theta_B - phi) - t_in_rad, 0.0)
    tilts_in = tilts_in.at[rim].add(delta_in[:, None] * r_dir)

    return dataclasses.replace(state, tilts_in=tilts_in, tilts_out=tilts_out)


def make_tilt_constraint_rows(spec):
    """(k, 2, Nv, 3) stacked (in, out) tilt-gradient row pairs, or None."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    if flags[0] != "active":
        return lambda state, topo, params: None
    static_has_disk = bool(flags[1])

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, phi, _inv_dr, r_hat, weights, _normal = matching_data(
            positions, topo, params
        )
        rim = _x(topo, "rim")
        disk = _x(topo, "disk")
        has_disk = static_has_disk
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
        r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
        use = valid & dir_ok
        coeff = jnp.where(use, jnp.sqrt(jnp.maximum(weights, 0.0)), 0.0)

        k = rim.shape[0]
        dtype = positions.dtype
        idx = jnp.arange(k)
        # out condition rows: gout = coeff * r_dir at rim row
        gout = jnp.zeros((k, n_rows, 3), dtype).at[idx, rim].add(
            coeff[:, None] * r_dir
        )
        zeros = jnp.zeros((k, n_rows, 3), dtype)
        out_pairs = jnp.stack([zeros, gout], axis=1)  # (k, 2=in/out, Nv, 3)

        if not has_disk:
            return out_pairs

        # in condition rows: gin = coeff * r_dir at rim row - coeff * disk_r_hat
        # at the matched disk row (disk-theta targeting off in default lanes)
        center = jnp.asarray(_x(topo, "center"), dtype)
        normal = jnp.asarray(_x(topo, "normal"), dtype)
        disk_pos = positions[disk]
        rel = disk_pos - center
        rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
        dlen = jnp.linalg.norm(rel_p, axis=1)
        disk_r_hat = jnp.where(
            (dlen > 1e-12)[:, None], rel_p / jnp.maximum(dlen, 1e-12)[:, None], 0.0
        )
        gin = jnp.zeros((k, n_rows, 3), dtype).at[idx, rim].add(coeff[:, None] * r_dir)
        gin = gin.at[idx, disk].add(-coeff[:, None] * disk_r_hat)
        in_pairs = jnp.stack([gin, zeros], axis=1)
        return jnp.concatenate([out_pairs, in_pairs], axis=0)

    return fn


def make_constraint_gradient_rows(spec):
    """Shape KKT rows tying rim/outer heights (one per condition per rim vertex)."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    if flags[0] != "active":
        return lambda state, topo, params: None
    static_has_disk = bool(flags[1])

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, _phi, inv_dr, _r_hat, weights, normal = matching_data(
            positions, topo, params
        )
        rim = _x(topo, "rim")
        outer = _x(topo, "outer")
        has_disk = static_has_disk
        k = rim.shape[0]
        n_rows = positions.shape[0]
        dtype = positions.dtype
        coeff = jnp.where(valid, jnp.sqrt(jnp.maximum(weights, 0.0)) * inv_dr, 0.0)
        idx = jnp.arange(k)
        nvec = jnp.asarray(normal, dtype)
        g_out = (
            jnp.zeros((k, n_rows, 3), dtype)
            .at[idx, rim]
            .add(coeff[:, None] * nvec)
            .at[idx, outer]
            .add(-coeff[:, None] * nvec)
        )
        if not has_disk:
            return g_out
        g_in = -g_out
        return jnp.concatenate([g_out, g_in], axis=0)

    return fn
