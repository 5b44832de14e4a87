"""Hard rim-matching constraint: outer-leaflet tilt vs slope (gamma = 0).

Parity: reference ``modules/constraints/rim_slope_match_out.py`` family in
its default ``pointwise_radial_v1`` mode:

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
  (sqrt(w_i) r_dir at the rim row, minus the disk-side term: the matched disk
  row's sqrt(w_i) disk_r_hat when the rings pair 1:1, or the arc-length-mean
  over the whole disk ring otherwise — rim_slope_match_utils.py:62-111);
- ``make_constraint_gradient_rows``: shape rows tying rim/outer heights
  (rim_slope_match_gradients.py:317-407): per rim vertex
  +sqrt(w_i) inv_dr_i n_hat at the rim row and -coeff*(w0, w1) n_hat at the
  two interpolated outer-ring rows, one row per condition.

Ring ordering (angular, about center/normal) is fixed at compile time; the
slope, arc-length weights, radial directions, and — when the rim and outer
rings have unequal counts — the normalized-arc-length interpolation pairing
(idx0, idx1, w0, w1; rim_slope_match_utils.py:182-221) are all computed from
live positions on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.utils.precision import fmax_tiny as _fmax_tiny


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


def _groups(gp):
    mode = str(gp.get("rim_slope_match_mode") or "pointwise_radial_v1").lower()
    return (
        mode,
        gp.get("rim_slope_match_group"),
        gp.get("rim_slope_match_outer_group"),
        gp.get("rim_slope_match_disk_group"),
    )


def _scaffold_mesh_op_mode(gp) -> str:
    """Scaffold hard-projection behavior for mesh-op/finalize contexts
    (reference rim_slope_match_params.py:116-126)."""
    mode = str(gp.get("rim_slope_match_scaffold_mesh_operation_mode") or "project")
    mode = mode.strip().lower()
    if mode not in {"project", "preserve_trace_v1"}:
        raise ValueError(
            "rim_slope_match_scaffold_mesh_operation_mode must be "
            "'project' or 'preserve_trace_v1'."
        )
    return mode


def compile_static(layout):
    """Hashable mode flags:
    (active, has_disk, interp_outer, local_disk, theta_is_param, staggered,
    disk_targeting, ring_average, scaffold, mesh_op_mode, projector_mode,
    has_trace).

    ``staggered`` selects the outer-shell tilt-target placement
    (shared_rim_staggered_v1 and physical_edge_staggered_v1): the OUT
    matching condition acts on the (interpolated) outer-ring rows instead of
    the rim row (reference rim_slope_match_params.py:
    _uses_outer_shell_tilt_matching, rim_slope_match_utils.py:16-59).
    ``disk_targeting`` selects the physical_edge inner law (reference
    _use_disk_theta_targeting + _disk_theta_rows_weights_and_direction):
    the IN condition acts on the disk-boundary row itself along the raw
    planar radial with the scalar theta_B target.
    ``ring_average`` aggregates every per-ring-vertex matching condition
    into ONE constraint per leaflet family (reference
    rim_slope_match_gradients.py:123-178 agg_* accumulation and the
    averaged enforcement in rim_slope_match_out.py:104-199).
    ``scaffold`` marks the physical-edge scaffold-trace lane
    (parity_trace_layer_radius set AND parity_outer_shells > 0, reference
    rim_slope_match_params.py:66-80): theta_B scalar targeting is disabled
    and theta comes from the disk-ring tilts.
    """
    gp = layout.mesh.global_parameters
    mode, group, outer_group, disk_group = _groups(gp)
    if mode == "physical_edge_staggered_v1":
        from membrane_solver_tpu.constraints.local_interface_shells import (
            build_shell_rows,
        )

        interface_group = disk_group or group
        if interface_group is None:
            return ("inactive",)
        shells = build_shell_rows(layout, group=str(interface_group))
        if shells is None or shells.disk_rows.size == 0:
            return ("inactive",)
        has_trace = gp.get("parity_trace_layer_radius") is not None
        scaffold = has_trace and int(gp.get("parity_outer_shells") or 0) > 0
        mesh_op_mode = _scaffold_mesh_op_mode(gp)
        projector_mode = str(
            gp.get("rim_slope_match_scaffold_projector_mode") or ""
        ).strip().lower()
        # Post-refinement the disk ring can outnumber the trace ring (the
        # refined disk boundary doubles while the free trace ring does not),
        # so the azimuth matching maps several conditions onto one target
        # row.  The reference's enforcement loop is sequential
        # (Gauss-Seidel; rim_slope_match_out.py:201-296), so shared rows see
        # earlier conditions' updates — the vectorized parallel update is
        # only equivalent when the pairing is injective.  Record the
        # sharedness at compile time so enforcement picks the scan form.
        matched = np.asarray(shells.rim_rows_for_disk)
        shared_targets = bool(len(np.unique(matched)) != len(matched))
        return (
            "active",
            True,   # has_disk (the disk ring IS the rim ring)
            False,  # shells are 1:1 azimuth-aligned, no interp
            True,   # local_disk
            (gp.get("rim_slope_match_thetaB_param") is not None) and not scaffold,
            True,   # outer-shell (staggered) OUT placement
            not scaffold,  # disk-targeted IN law (off on scaffold-trace lanes)
            False,  # ring_average
            scaffold,
            mesh_op_mode,
            projector_mode,
            has_trace,
            shared_targets,
        )
    if (
        mode
        not in {
            "pointwise_radial_v1",
            "ring_average_radial_v1",
            "shared_rim_staggered_v1",
        }
        or group is None
        or outer_group is None
    ):
        return ("inactive",)
    # degenerate disk==rim group coupling is disabled, as in the reference
    # (_sanitize_disk_group)
    if disk_group is not None and str(disk_group) == str(group):
        disk_group = None
    rim = _group_rows(layout, group)
    outer = _group_rows(layout, outer_group)
    disk = _group_rows(layout, disk_group) if disk_group is not None else []
    if not rim or not outer:
        return ("inactive",)
    return (
        "active",
        bool(disk),
        len(outer) != len(rim),
        bool(disk) and len(disk) == len(rim),
        gp.get("rim_slope_match_thetaB_param") is not None,
        mode == "shared_rim_staggered_v1",
        False,
        mode == "ring_average_radial_v1",
        False,      # scaffold
        "project",  # mesh_op_mode (unused off-scaffold)
        "",         # projector_mode
        False,      # has_trace
    )


def _pad_ring(layout, rows):
    n = max(len(rows), 1)
    nc = 1
    while nc < n:
        nc *= 2
    return (
        layout.pad_rows(np.asarray(rows or [0], dtype=np.int32), nc, 0),
        layout.pad_rows(
            np.ones(len(rows), dtype=bool) if rows else np.zeros(1, dtype=bool),
            nc,
            False,
        ),
    )


def compile_topology(layout) -> dict:
    gp = layout.mesh.global_parameters
    mode, group, outer_group, disk_group = _groups(gp)
    center = np.asarray(gp.get("rim_slope_match_center") or [0, 0, 0], dtype=float)
    normal = np.asarray(gp.get("rim_slope_match_normal") or [0, 0, 1], dtype=float)
    normal /= max(np.linalg.norm(normal), 1e-15)

    if mode == "physical_edge_staggered_v1":
        # physical-edge local shells: the "rim" of the matching is the disk
        # boundary ring and the "outer" is the first free-membrane shell,
        # 1:1 azimuth-aligned (reference rim_slope_match_payload.py:88-123)
        from membrane_solver_tpu.constraints.local_interface_shells import (
            build_shell_rows,
        )

        interface_group = disk_group or group
        shells = (
            build_shell_rows(layout, group=str(interface_group))
            if interface_group is not None
            else None
        )
        empty = {
            "rim": np.zeros(1, dtype=np.int32),
            "outer": np.zeros(1, dtype=np.int32),
            "disk": np.zeros(1, dtype=np.int32),
            "valid": np.zeros(1, dtype=bool),
            "outer_valid": np.zeros(1, dtype=bool),
            "disk_valid": np.zeros(1, dtype=bool),
            "center": center,
            "normal": normal,
        }
        if shells is None or shells.disk_rows.size == 0:
            return empty
        rim = [int(r) for r in shells.disk_rows]
        outer = [int(r) for r in shells.rim_rows_for_disk]
        rim_arr, rim_valid = _pad_ring(layout, rim)
        outer_arr, outer_valid = _pad_ring(layout, outer)
        return {
            "rim": rim_arr,
            "outer": outer_arr,
            "disk": rim_arr,
            "valid": rim_valid,
            "outer_valid": outer_valid,
            "disk_valid": rim_valid,
            "center": center,
            "normal": normal,
            "shell_radii": np.asarray(
                [shells.disk_radius, shells.rim_radius, shells.outer_radius]
            ),
        }
    if mode not in {
        "pointwise_radial_v1",
        "ring_average_radial_v1",
        "shared_rim_staggered_v1",
    }:
        # parity: reference _resolve_matching_mode raises ValueError
        raise ValueError(
            "rim_slope_match_mode must be 'pointwise_radial_v1' or "
            "'ring_average_radial_v1' or 'shared_rim_staggered_v1' or "
            "'physical_edge_staggered_v1'."
        )
    if disk_group is not None and str(disk_group) == str(group or ""):
        disk_group = None  # reference _sanitize_disk_group (all non-physical modes)
    empty = {
        "rim": np.zeros(1, dtype=np.int32),
        "outer": np.zeros(1, dtype=np.int32),
        "disk": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "outer_valid": np.zeros(1, dtype=bool),
        "disk_valid": np.zeros(1, dtype=bool),
        "center": center,
        "normal": normal,
    }
    if group is None or outer_group is None:
        return empty

    rim_raw = _group_rows(layout, group)
    outer_raw = _group_rows(layout, outer_group)
    if not rim_raw or not outer_raw:
        return empty
    rim = _order_ring(layout, rim_raw, center, normal)
    outer = _order_ring(layout, outer_raw, center, normal)
    disk_raw = _group_rows(layout, disk_group) if disk_group is not None else []
    disk = _order_ring(layout, disk_raw, center, normal) if disk_raw else []
    rim_arr, rim_valid = _pad_ring(layout, rim)
    outer_arr, outer_valid = _pad_ring(layout, outer)
    disk_arr, disk_valid = _pad_ring(layout, disk)
    return {
        "rim": rim_arr,
        "outer": outer_arr,
        "disk": disk_arr,
        "valid": rim_valid,
        "outer_valid": outer_valid,
        "disk_valid": disk_valid,
        "center": center,
        "normal": normal,
    }


def _x(topo, key, prefix="constraint:rim_slope_match_out"):
    return topo.extras[f"{prefix}/{key}"]


def _ring_arc_params(pos, valid):
    """Normalized arc-length parameter per ring vertex (utils:182-194)."""
    k = pos.shape[0]
    idx = jnp.arange(k)
    n_live = jnp.sum(valid.astype(jnp.int32))
    nxt = jnp.where(idx + 1 >= n_live, 0, idx + 1)
    seg = jnp.where(idx < n_live, jnp.linalg.norm(pos[nxt] - pos, axis=1), 0.0)
    total = jnp.sum(seg)
    s = jnp.concatenate([jnp.zeros((1,), pos.dtype), jnp.cumsum(seg)[:-1]])
    return s / _fmax_tiny(total), total


def _interp_ring(outer_pos, outer_valid, s_targets):
    """(idx0, idx1, w0, w1) arc-length interpolation pairing (utils:196-221)."""
    s_out, _total = _ring_arc_params(outer_pos, outer_valid)
    k = outer_pos.shape[0]
    n_live = jnp.sum(outer_valid.astype(jnp.int32))
    # push padded entries past any target in [0, 1)
    s_sorted = jnp.where(jnp.arange(k) < n_live, s_out, 2.0)
    idx1_raw = jnp.searchsorted(s_sorted, s_targets, side="right")
    idx1 = idx1_raw % jnp.maximum(n_live, 1)
    idx0 = (idx1_raw - 1) % jnp.maximum(n_live, 1)
    s0 = s_out[idx0]
    s1 = s_out[idx1]
    s1_adj = jnp.where(s1 <= s0, s1 + 1.0, s1)
    st_adj = jnp.where(s_targets < s0, s_targets + 1.0, s_targets)
    denom = s1_adj - s0
    t = jnp.where(denom > 1e-12, (st_adj - s0) / jnp.maximum(denom, 1e-12), 0.0)
    return idx0, idx1, 1.0 - t, t


def matching_data(positions, topo, params, *, interp_outer: bool, prefix="constraint:rim_slope_match_out"):
    """Live matching payload (valid, phi, inv_dr, r_hat, weights, normal, outer map).

    Parity: rim_slope_match_payload.py:_build_matching_data (pointwise branch)
    — recomputed from the current positions at every evaluation, as the
    reference does on each version-keyed cache miss.
    """
    dtype = positions.dtype
    rim = _x(topo, "rim", prefix)
    outer = _x(topo, "outer", prefix)
    ring_valid = _x(topo, "valid", prefix)
    outer_valid = _x(topo, "outer_valid", prefix)
    center = jnp.asarray(_x(topo, "center", prefix), dtype)
    normal = jnp.asarray(_x(topo, "normal", prefix), dtype)

    rim_pos = positions[rim]
    rel = rim_pos - center
    rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
    r_len = jnp.linalg.norm(rel_p, axis=1)
    good = ring_valid & (r_len > 1e-12)
    r_hat = jnp.where(good[:, None], rel_p / jnp.maximum(r_len, 1e-12)[:, None], 0.0)

    k = rim.shape[0]
    if interp_outer:
        s_rim, _ = _ring_arc_params(rim_pos, ring_valid)
        idx0, idx1, w0, w1 = _interp_ring(positions[outer], outer_valid, s_rim)
        outer_pos = (
            w0[:, None] * positions[outer[idx0]] + w1[:, None] * positions[outer[idx1]]
        )
    else:
        idx0 = idx1 = jnp.arange(k)
        w0 = jnp.ones((k,), dtype)
        w1 = jnp.zeros((k,), dtype)
        outer_pos = positions[outer]

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
    idx = jnp.arange(k)
    n_live = jnp.sum(ring_valid.astype(jnp.int32))
    nxt = jnp.where(idx + 1 >= n_live, 0, idx + 1)
    prv = jnp.where(idx - 1 < 0, n_live - 1, idx - 1)
    l_next = jnp.linalg.norm(rim_pos[nxt] - rim_pos, axis=1)
    l_prev = jnp.linalg.norm(rim_pos - rim_pos[prv], axis=1)
    weights = jnp.where(valid, 0.5 * (l_next + l_prev), 0.0)
    return valid, phi, inv_dr, r_hat, weights, normal, (idx0, idx1, w0, w1)


def _tangent_radial(r_hat, vnormals, rows):
    n = vnormals[rows]
    r_dir = r_hat - jnp.sum(r_hat * n, axis=1, keepdims=True) * n
    norm = jnp.linalg.norm(r_dir, axis=1)
    ok = norm > 1e-12
    return jnp.where(ok[:, None], r_dir / jnp.maximum(norm, 1e-12)[:, None], 0.0), ok


def _staggered_targets(topo, r_hat, vnormals, omap):
    """Tilt-target slots for shared_rim_staggered_v1.

    Per rim index i the matching conditions act on the interpolated outer
    rows (outer[idx0], outer[idx1]) with weights (w0, w1); the radial
    direction is r_hat tangent-projected with the WEIGHT-BLENDED unit normal
    of those rows (reference rim_slope_match_utils.py:26-59).

    Returns (row0, row1, w0, w1, r_dir, ok, denom) with denom = w0^2 + w1^2.
    """
    outer = _x(topo, "outer")
    idx0, idx1, w0, w1 = omap
    row0 = outer[idx0]
    row1 = outer[idx1]
    n = w0[:, None] * vnormals[row0] + w1[:, None] * vnormals[row1]
    nn = jnp.linalg.norm(n, axis=1)
    ok_n = nn > 1e-12
    n = jnp.where(ok_n[:, None], n / jnp.maximum(nn, 1e-12)[:, None], 0.0)
    r_dir = r_hat - jnp.sum(r_hat * n, axis=1, keepdims=True) * n
    rn = jnp.linalg.norm(r_dir, axis=1)
    ok = ok_n & (rn > 1e-12)
    r_dir = jnp.where(ok[:, None], r_dir / jnp.maximum(rn, 1e-12)[:, None], 0.0)
    denom = w0 * w0 + w1 * w1
    return row0, row1, w0, w1, r_dir, ok, denom


def _staggered_apply(tilts, row0, row1, w0, w1, r_dir, delta, denom):
    """Distribute the per-condition corrections onto the two target slots.

    tilts[row_k] += (delta * w_k / denom) * r_dir, matching the reference's
    per-condition update (rim_slope_match_out.py:225-240).  Used by the
    1:1 equal-count pairing, where no two conditions share a target row,
    so the vectorized scatter equals the reference's sequential loop.
    """
    safe = jnp.maximum(denom, 1e-12)
    upd0 = (delta * w0 / safe)[:, None] * r_dir
    upd1 = (delta * w1 / safe)[:, None] * r_dir
    return tilts.at[row0].add(upd0).at[row1].add(jnp.where((w1 != 0.0)[:, None], upd1, 0.0))


def _staggered_enforce_field(tilts, row0, row1, w0, w1, r_dir, ok, denom, target, *, sequential):
    """Enforce Sum_k w_k (t[row_k] . r_dir) = target per condition.

    ``sequential`` replicates the reference's Gauss-Seidel loop (each
    condition sees previous conditions' updates on shared target rows —
    the interp pairing shares rows between adjacent conditions,
    rim_slope_match_out.py:203-240); the non-sequential form is used for
    1:1 pairings where no rows are shared and order cannot matter.
    """
    if not sequential:
        t_rad = w0 * jnp.sum(tilts[row0] * r_dir, axis=1) + w1 * jnp.sum(
            tilts[row1] * r_dir, axis=1
        )
        delta = jnp.where(ok, target - t_rad, 0.0)
        return _staggered_apply(tilts, row0, row1, w0, w1, r_dir, delta, denom)

    def step(t, inp):
        r0, r1, a0, a1, rd, okay, den, tgt = inp
        t_rad = a0 * jnp.dot(t[r0], rd) + a1 * jnp.dot(t[r1], rd)
        delta = jnp.where(okay, tgt - t_rad, 0.0)
        safe = jnp.maximum(den, 1e-12)
        t = t.at[r0].add((delta * a0 / safe) * rd)
        t = t.at[r1].add(jnp.where(a1 != 0.0, (delta * a1 / safe), 0.0) * rd)
        return t, None

    tilts, _ = jax.lax.scan(
        step, tilts, (row0, row1, w0, w1, r_dir, ok, denom, target)
    )
    return tilts


def _disk_geometry(positions, topo, dtype, prefix="constraint:rim_slope_match_out"):
    """(disk rows, valid, r_hat, arc-length weights) for the disk ring."""
    disk = _x(topo, "disk", prefix)
    disk_valid = _x(topo, "disk_valid", prefix)
    center = jnp.asarray(_x(topo, "center", prefix), dtype)
    normal = jnp.asarray(_x(topo, "normal", prefix), dtype)
    disk_pos = positions[disk]
    rel = disk_pos - center
    rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
    dlen = jnp.linalg.norm(rel_p, axis=1)
    good = disk_valid & (dlen > 1e-12)
    disk_r_hat = jnp.where(
        good[:, None], rel_p / jnp.maximum(dlen, 1e-12)[:, None], 0.0
    )
    k = disk.shape[0]
    idx = jnp.arange(k)
    n_live = jnp.sum(disk_valid.astype(jnp.int32))
    nxt = jnp.where(idx + 1 >= n_live, 0, idx + 1)
    prv = jnp.where(idx - 1 < 0, n_live - 1, idx - 1)
    l_next = jnp.linalg.norm(disk_pos[nxt] - disk_pos, axis=1)
    l_prev = jnp.linalg.norm(disk_pos - disk_pos[prv], axis=1)
    w = jnp.where(good, 0.5 * (l_next + l_prev), 0.0)
    return disk, good, disk_r_hat, w


def _spec_flags_for(spec, key="constraint:rim_slope_match_out"):
    flags = spec.static_of(key, ("inactive",))
    if flags[0] != "active":
        return None
    if len(flags) < 5:
        return (bool(flags[1]), False, bool(flags[1]), True)
    return (bool(flags[1]), bool(flags[2]), bool(flags[3]), bool(flags[4]))


def _spec_flags(spec):
    """(has_disk, interp_outer, local_disk, theta_is_param) or None."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    if flags[0] != "active":
        return None
    # legacy 2-tuple from older compiles: assume equal rings, param theta
    if len(flags) < 5:
        return (bool(flags[1]), False, bool(flags[1]), True)
    return (bool(flags[1]), bool(flags[2]), bool(flags[3]), bool(flags[4]))


def _spec_staggered(spec) -> bool:
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    return flags[0] == "active" and len(flags) > 5 and bool(flags[5])


def _spec_disk_targeting(spec) -> bool:
    """physical_edge inner law: IN condition on the disk-boundary row itself
    along the raw planar radial (reference _use_disk_theta_targeting)."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    return flags[0] == "active" and len(flags) > 6 and bool(flags[6])


def _spec_ring_average(spec) -> bool:
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    return flags[0] == "active" and len(flags) > 7 and bool(flags[7])


def _spec_scaffold(spec):
    """(scaffold_active, mesh_op_mode, projector_mode, has_trace) or None."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    if flags[0] != "active" or len(flags) < 12:
        return None
    return bool(flags[8]), str(flags[9]), str(flags[10]), bool(flags[11])


def _spec_shared_targets(spec) -> bool:
    """True when the compiled azimuth pairing maps >1 matching condition onto
    the same outer-ring row (e.g. a refined disk ring against an unrefined
    trace ring).  Shared rows make the reference's sequential enforcement
    loop order-dependent, so the jitted enforcement must use its scan form."""
    flags = spec.static_of("constraint:rim_slope_match_out", ("inactive",))
    return flags[0] == "active" and len(flags) > 12 and bool(flags[12])


def _theta_targets(tilts_in, positions, topo, params, phi, flags):
    """Per-rim-index theta_disk target (rim_slope_match_out.py:82-101)."""
    has_disk, _interp_outer, local_disk, theta_is_param = flags
    if theta_is_param or not has_disk:
        theta = params.get("tilt_thetaB_value", jnp.asarray(0.0))
        return jnp.full_like(phi, theta)
    disk, dgood, disk_r_hat, dw = _disk_geometry(positions, topo, positions.dtype)
    theta_vals = jnp.sum(tilts_in[disk] * disk_r_hat, axis=1)
    if local_disk:
        return theta_vals
    wsum = jnp.sum(jnp.where(dgood, dw, 0.0))
    return jnp.full_like(
        phi,
        jnp.sum(jnp.where(dgood, dw * theta_vals, 0.0)) / _fmax_tiny(wsum),
    )


def _ring_average_delta(ok, coeff, target, t_rad):
    """Scalar averaged residual: sum coeff*(target - t_rad)/sum coeff
    (reference rim_slope_match_out.py:104-199 out_num/out_den)."""
    c = jnp.where(ok, coeff, 0.0)
    den = jnp.sum(c)
    num = jnp.sum(c * (target - t_rad))
    return jnp.where(den > 0.0, num / _fmax_tiny(den), 0.0)


def make_enforce_tilts(spec):
    flags = _spec_flags(spec)
    if flags is None:
        return None
    has_disk, interp_outer, local_disk, theta_is_param = flags
    staggered = _spec_staggered(spec)
    ring_average = _spec_ring_average(spec)
    sequential = interp_outer or _spec_shared_targets(spec)

    disk_targeting = _spec_disk_targeting(spec)

    def enforce(state, topo, params):
        """Project tilts onto the matching conditions (pointwise/staggered)."""
        positions = state.positions
        valid, phi, _inv_dr, r_hat, ring_w, _normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)

        tilts_in = state.tilts_in
        tilts_out = state.tilts_out
        if staggered:
            row0, row1, w0, w1, r_dir, dir_ok, denom = _staggered_targets(
                topo, r_hat, vnormals, omap
            )
            use = valid & dir_ok
            second = (row1 != row0) | (w1 != 0.0)
            fo = topo.tilt_fixed_out_mask
            fi = topo.tilt_fixed_in_mask
            ok_out = use & ~(fo[row0] | (fo[row1] & second))
            tilts_out = _staggered_enforce_field(
                tilts_out, row0, row1, w0, w1, r_dir, ok_out, denom, phi,
                sequential=sequential,
            )

            theta_i = _theta_targets(tilts_in, positions, topo, params, phi, flags)
            if disk_targeting:
                # physical_edge IN law: t_in[rim_i] . r_hat_i = theta - phi_i
                # on the disk-boundary row along the RAW planar radial
                # (reference rim_slope_match_out.py:246-293 via
                # _disk_theta_rows_weights_and_direction, local_disk)
                ok_in = use & ~fi[rim]
                t_in_rad = jnp.sum(tilts_in[rim] * r_hat, axis=1)
                delta_in = jnp.where(ok_in, (theta_i - phi) - t_in_rad, 0.0)
                tilts_in = tilts_in.at[rim].add(delta_in[:, None] * r_hat)
            else:
                ok_in = use & ~(fi[row0] | (fi[row1] & second))
                tilts_in = _staggered_enforce_field(
                    tilts_in, row0, row1, w0, w1, r_dir, ok_in, denom, theta_i - phi,
                    sequential=sequential,
                )
            return dataclasses.replace(state, tilts_in=tilts_in, tilts_out=tilts_out)

        r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
        use = valid & dir_ok

        ok_out = use & ~topo.tilt_fixed_out_mask[rim]
        t_out_rad = jnp.sum(tilts_out[rim] * r_dir, axis=1)
        if ring_average:
            coeff = jnp.sqrt(jnp.maximum(ring_w, 0.0))
            d_out = _ring_average_delta(ok_out, coeff, phi, t_out_rad)
            delta_out = jnp.where(ok_out, d_out, 0.0)
        else:
            delta_out = jnp.where(ok_out, phi - t_out_rad, 0.0)
        tilts_out = tilts_out.at[rim].add(delta_out[:, None] * r_dir)

        # inner condition target theta_disk (rim_slope_match_out.py:82-101)
        theta_i = _theta_targets(tilts_in, positions, topo, params, phi, flags)
        ok_in = use & ~topo.tilt_fixed_in_mask[rim]
        t_in_rad = jnp.sum(tilts_in[rim] * r_dir, axis=1)
        if ring_average:
            coeff = jnp.sqrt(jnp.maximum(ring_w, 0.0))
            d_in = _ring_average_delta(ok_in, coeff, theta_i - phi, t_in_rad)
            delta_in = jnp.where(ok_in, d_in, 0.0)
        else:
            delta_in = jnp.where(ok_in, (theta_i - phi) - t_in_rad, 0.0)
        tilts_in = tilts_in.at[rim].add(delta_in[:, None] * r_dir)

        return dataclasses.replace(state, tilts_in=tilts_in, tilts_out=tilts_out)

    return enforce


def make_frozen_enforce_tilts(spec):
    """Frozen split of :func:`make_enforce_tilts` (positions constant).

    The matching payload (phi targets, tangent radial directions, arc
    weights, disk ring geometry) is position-only and baked once per relax
    call; the per-iteration work is the ring gathers/updates on the tilt
    fields with arithmetic identical to the full path.
    """
    flags = _spec_flags(spec)
    if flags is None:
        return None
    has_disk, interp_outer, local_disk, theta_is_param = flags
    staggered = _spec_staggered(spec)
    ring_average = _spec_ring_average(spec)
    disk_targeting = _spec_disk_targeting(spec)
    sequential = interp_outer or _spec_shared_targets(spec)

    def _frozen_theta(tin, fr, params, phi):
        if theta_is_param or not has_disk:
            theta = params.get("tilt_thetaB_value", jnp.asarray(0.0))
            return jnp.full_like(phi, theta)
        theta_vals = jnp.sum(tin[fr["disk"]] * fr["disk_r_hat"], axis=1)
        if local_disk:
            return theta_vals
        wsum = jnp.sum(jnp.where(fr["dgood"], fr["dw"], 0.0))
        return jnp.full_like(
            phi,
            jnp.sum(jnp.where(fr["dgood"], fr["dw"] * theta_vals, 0.0))
            / _fmax_tiny(wsum),
        )

    def precompute(state, topo, params):
        positions = state.positions
        valid, phi, _inv_dr, r_hat, ring_w, _normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
        if staggered:
            row0, row1, w0, w1, r_dir, dir_ok, denom = _staggered_targets(
                topo, r_hat, vnormals, omap
            )
            use = valid & dir_ok
            second = (row1 != row0) | (w1 != 0.0)
            fo = topo.tilt_fixed_out_mask
            fi = topo.tilt_fixed_in_mask
            fr = {
                "phi": phi,
                "row0": row0,
                "row1": row1,
                "w0": w0,
                "w1": w1,
                "denom": denom,
                "r_dir": r_dir,
                "ok_out": use & ~(fo[row0] | (fo[row1] & second)),
                "ok_in": use & ~(fi[row0] | (fi[row1] & second)),
            }
            if disk_targeting:
                fr["rim"] = rim
                fr["r_hat"] = r_hat
                fr["ok_in"] = use & ~fi[rim]
        else:
            r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
            use = valid & dir_ok
            fr = {
                "rim": rim,
                "phi": phi,
                "r_dir": r_dir,
                "coeff": jnp.sqrt(jnp.maximum(ring_w, 0.0)),
                "ok_out": use & ~topo.tilt_fixed_out_mask[rim],
                "ok_in": use & ~topo.tilt_fixed_in_mask[rim],
            }
        if not (theta_is_param or not has_disk):
            disk, dgood, disk_r_hat, dw = _disk_geometry(
                positions, topo, positions.dtype
            )
            fr.update(disk=disk, dgood=dgood, disk_r_hat=disk_r_hat, dw=dw)
        return fr

    def enforce(tin, tout, fr, topo, params):
        phi, r_dir = fr["phi"], fr["r_dir"]
        if staggered:
            row0, row1, w0, w1, denom = (
                fr["row0"], fr["row1"], fr["w0"], fr["w1"], fr["denom"],
            )
            tout = _staggered_enforce_field(
                tout, row0, row1, w0, w1, r_dir, fr["ok_out"], denom, phi,
                sequential=sequential,
            )
            theta_i = _frozen_theta(tin, fr, params, phi)
            if disk_targeting:
                rim, r_hat = fr["rim"], fr["r_hat"]
                t_in_rad = jnp.sum(tin[rim] * r_hat, axis=1)
                delta_in = jnp.where(fr["ok_in"], (theta_i - phi) - t_in_rad, 0.0)
                tin = tin.at[rim].add(delta_in[:, None] * r_hat)
            else:
                tin = _staggered_enforce_field(
                    tin, row0, row1, w0, w1, r_dir, fr["ok_in"], denom,
                    theta_i - phi, sequential=sequential,
                )
            return tin, tout

        rim = fr["rim"]
        t_out_rad = jnp.sum(tout[rim] * r_dir, axis=1)
        if ring_average:
            d_out = _ring_average_delta(fr["ok_out"], fr["coeff"], phi, t_out_rad)
            delta_out = jnp.where(fr["ok_out"], d_out, 0.0)
        else:
            delta_out = jnp.where(fr["ok_out"], phi - t_out_rad, 0.0)
        tout = tout.at[rim].add(delta_out[:, None] * r_dir)

        theta_i = _frozen_theta(tin, fr, params, phi)
        t_in_rad = jnp.sum(tin[rim] * r_dir, axis=1)
        if ring_average:
            d_in = _ring_average_delta(
                fr["ok_in"], fr["coeff"], theta_i - phi, t_in_rad
            )
            delta_in = jnp.where(fr["ok_in"], d_in, 0.0)
        else:
            delta_in = jnp.where(fr["ok_in"], (theta_i - phi) - t_in_rad, 0.0)
        tin = tin.at[rim].add(delta_in[:, None] * r_dir)
        return tin, tout

    return precompute, enforce


def make_enforce(spec):
    """Trace-shell height/tilt projection for physical-edge trace lanes.

    Parity: reference rim_slope_match_out.enforce_constraint
    (rim_slope_match_out.py:297-533) — for ``physical_edge_staggered_v1``
    with ``parity_trace_layer_radius`` set, project the matched shell's
    heights (along the lane normal) and the outer radial tilt onto a joint
    proximal solve of the rim law; with the scaffold-trace lane in
    ``preserve_trace_v1`` mesh-operation mode, the projection is skipped
    entirely in mesh_operation/finalize contexts (the reference records
    {"mode": "preserve_trace_v1", "skipped": True}).  The
    ``continuity_v2`` projector mode replaces the proximal solve with the
    half-split target phi = t_out = theta/2.
    """
    flags = _spec_flags(spec)
    if flags is None:
        return None
    sc = _spec_scaffold(spec)
    if sc is None:
        return None
    scaffold, mesh_op_mode, projector_mode, has_trace = sc
    if not (_spec_staggered(spec) and has_trace):
        return None  # reference early-outs when trace_layer_radius is None
    has_disk, interp_outer, local_disk, theta_is_param = flags

    def enforce(state, topo, params, context="minimize"):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return state
        if (
            context in {"mesh_operation", "finalize"}
            and scaffold
            and mesh_op_mode == "preserve_trace_v1"
        ):
            return state
        positions = state.positions
        dtype = positions.dtype
        valid, phi, inv_dr, r_hat, _w, normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        outer = _x(topo, "outer")
        idx0, idx1, w0, w1 = omap
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
        row0, row1, sw0, sw1, r_dir, dir_ok, _denom = _staggered_targets(
            topo, r_hat, vnormals, omap
        )
        tin, tout = state.tilts_in, state.tilts_out

        t_out_rad = sw0 * jnp.sum(tout[row0] * r_dir, axis=1) + sw1 * jnp.sum(
            tout[row1] * r_dir, axis=1
        )
        t_in_rad = sw0 * jnp.sum(tin[row0] * r_dir, axis=1) + sw1 * jnp.sum(
            tin[row1] * r_dir, axis=1
        )
        theta_i = _theta_targets(tin, positions, topo, params, phi, flags)
        continuity = theta_i - t_in_rad

        ok = valid & dir_ok & (jnp.abs(inv_dr) > 1e-12)
        dr = jnp.where(ok, 1.0 / jnp.where(ok, inv_dr, 1.0), 0.0)
        nvec = jnp.asarray(normal, dtype)

        if projector_mode == "continuity_v2":
            phi_target = 0.5 * theta_i
            t_out_target = phi_target
        else:
            # joint local proximal solve, equal weights on staying near the
            # current secant / outer tilt and satisfying t_out = phi and
            # t_in = theta - phi (reference :470-478)
            phi_target = (2.0 * phi + t_out_rad + 2.0 * continuity) / 5.0
            t_out_target = 0.5 * (phi_target + t_out_rad)

        h_rim = positions[rim] @ nvec
        target_h = h_rim + phi_target * dr

        o0 = outer[idx0]
        o1 = outer[idx1]
        use0 = ok & (jnp.abs(w0) > 1e-12)
        use1 = ok & (jnp.abs(w1) > 1e-12)
        h_num = (
            jnp.zeros((n_rows,), dtype)
            .at[o0].add(jnp.where(use0, w0 * target_h, 0.0))
            .at[o1].add(jnp.where(use1, w1 * target_h, 0.0))
        )
        h_den = (
            jnp.zeros((n_rows,), dtype)
            .at[o0].add(jnp.where(use0, jnp.abs(w0), 0.0))
            .at[o1].add(jnp.where(use1, jnp.abs(w1), 0.0))
        )
        t_num = (
            jnp.zeros((n_rows,), dtype)
            .at[o0].add(jnp.where(use0, w0 * t_out_target, 0.0))
            .at[o1].add(jnp.where(use1, w1 * t_out_target, 0.0))
        )
        t_den = h_den

        move = (h_den > 1e-12) & ~topo.fixed_mask
        cur_h = positions @ nvec
        target_mean = h_num / _fmax_tiny(h_den)
        new_positions = jnp.where(
            move[:, None],
            positions + ((target_mean - cur_h)[:, None] * nvec[None, :]),
            positions,
        )

        # outer radial tilt replacement on the updated positions, with the
        # pre-update vertex normals (reference :507-530 reads `normals`
        # computed before the height loop)
        radius = jnp.linalg.norm(new_positions[:, :2], axis=1)
        r_ok = radius > 1e-12
        r_hat_row = jnp.where(
            r_ok[:, None],
            jnp.concatenate(
                [
                    new_positions[:, :2] / _fmax_tiny(radius)[:, None],
                    jnp.zeros((n_rows, 1), dtype),
                ],
                axis=1,
            ),
            0.0,
        )
        rd = r_hat_row - jnp.sum(r_hat_row * vnormals, axis=1)[:, None] * vnormals
        rd_n = jnp.linalg.norm(rd, axis=1)
        rd_ok = rd_n > 1e-12
        rd = jnp.where(rd_ok[:, None], rd / _fmax_tiny(rd_n)[:, None], 0.0)
        upd = (t_den > 1e-12) & ~topo.tilt_fixed_out_mask & r_ok & rd_ok
        radial = jnp.sum(tout * rd, axis=1)
        target_tilt = t_num / _fmax_tiny(t_den)
        new_tout = jnp.where(
            upd[:, None],
            tout + ((target_tilt - radial)[:, None] * rd),
            tout,
        )
        return dataclasses.replace(
            state, positions=new_positions, tilts_out=new_tout
        )

    return enforce


def enforce_tilts(state, topo, params):
    """Module-level fallback used when no spec is available (param-theta lane)."""
    if "constraint:rim_slope_match_out/rim" not in topo.extras:
        return state
    fake = type(
        "S",
        (),
        {
            "static_of": lambda self, key, default: (
                "active",
                True,
                False,
                True,
                True,
            )
        },
    )()
    fn = make_enforce_tilts(fake)
    return fn(state, topo, params)


def make_tilt_constraint_rows(spec):
    """(k, 2, Nv, 3) stacked (in, out) tilt-gradient row pairs, or None."""
    flags = _spec_flags(spec)
    if flags is None:
        return lambda state, topo, params: None
    has_disk, interp_outer, local_disk, _theta_is_param = flags
    staggered = _spec_staggered(spec)
    ring_average = _spec_ring_average(spec)
    disk_targeting = _spec_disk_targeting(spec)

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, phi, _inv_dr, r_hat, weights, _normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
        if staggered:
            row0, row1, w0, w1, r_dir, dir_ok, _denom = _staggered_targets(
                topo, r_hat, vnormals, omap
            )
        else:
            r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
        use = valid & dir_ok
        coeff = jnp.where(use, jnp.sqrt(jnp.maximum(weights, 0.0)), 0.0)

        k = rim.shape[0]
        dtype = positions.dtype
        idx = jnp.arange(k)

        def base_row(leaf_sign=1.0):
            """coeff * r_dir scattered at the condition's target slots."""
            g = jnp.zeros((k, n_rows, 3), dtype)
            if staggered:
                g = g.at[idx, row0].add((coeff * w0)[:, None] * r_dir)
                g = g.at[idx, row1].add((coeff * w1)[:, None] * r_dir)
                return g
            return g.at[idx, rim].add(coeff[:, None] * r_dir)

        def agg(pairs):
            """ring_average: one aggregate condition per leaflet family
            (reference rim_slope_match_gradients.py agg_* accumulation)."""
            return jnp.sum(pairs, axis=0, keepdims=True) if ring_average else pairs

        gout = base_row()
        zeros = jnp.zeros((k, n_rows, 3), dtype)
        out_pairs = agg(jnp.stack([zeros, gout], axis=1))  # (k, 2=in/out, Nv, 3)

        if not has_disk:
            return out_pairs

        if disk_targeting:
            # physical_edge in-rows: coeff * raw planar r_hat at the
            # disk-boundary (rim) row only (reference
            # rim_slope_match_gradients.py:519-536, theta-scalar active)
            gin = jnp.zeros((k, n_rows, 3), dtype).at[idx, rim].add(
                coeff[:, None] * r_hat
            )
            in_pairs = agg(jnp.stack([gin, zeros], axis=1))
            return jnp.concatenate([out_pairs, in_pairs], axis=0)

        # in rows: coeff * r_dir at the target slots minus the disk-side
        # term (rim_slope_match_utils.py:90-111; theta-scalar lanes without
        # disk-theta targeting use the same structure)
        disk, dgood, disk_r_hat, dw = _disk_geometry(positions, topo, dtype)
        gin = base_row()
        if local_disk:
            gin = gin.at[idx, disk].add(-coeff[:, None] * disk_r_hat)
        else:
            wsum = jnp.sum(jnp.where(dgood, dw, 0.0))
            mean_dirs = (dw / _fmax_tiny(wsum))[:, None] * disk_r_hat
            shared = jnp.zeros((n_rows, 3), dtype).at[disk].add(
                jnp.where(dgood[:, None], mean_dirs, 0.0)
            )
            gin = gin - coeff[:, None, None] * shared[None, :, :]
        in_pairs = agg(jnp.stack([gin, zeros], axis=1))
        return jnp.concatenate([out_pairs, in_pairs], axis=0)

    return fn


def make_compact_tilt_rows(spec):
    """Compact tilt rows: out rows touch one (rim, out) slot; in rows touch
    (rim, in) plus the paired (disk, in) slot (local-disk mode), or
    (rim, in) plus a rank-1 background — the arc-length-mean disk field
    shared by every in row — in the shared-mean-field mode.  The rank-1
    extension keeps the whole KKT projection in O(k s + Nv) per iteration
    instead of the O(k Nv) dense matvecs the mean-field coupling would
    otherwise force."""
    flags = _spec_flags(spec)
    if flags is None:
        # inactive on this lane: contribute no rows (returning None here
        # would wrongly mark the module "not compact-representable" and
        # force every OTHER module's rows onto the dense fallback)
        return lambda state, topo, params: None
    if _spec_ring_average(spec):
        # one aggregate row touching the whole ring has no compact-slot
        # form; the dense builders carry this mode
        return None
    has_disk, interp_outer, local_disk, _theta_is_param = flags
    staggered = _spec_staggered(spec)
    disk_targeting = _spec_disk_targeting(spec)

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, phi, _inv_dr, r_hat, weights, _normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        n_rows = positions.shape[0]
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
        if staggered:
            row0, row1, w0, w1, r_dir, dir_ok, _denom = _staggered_targets(
                topo, r_hat, vnormals, omap
            )
        else:
            r_dir, dir_ok = _tangent_radial(r_hat, vnormals, rim)
        use = valid & dir_ok
        coeff = jnp.where(use, jnp.sqrt(jnp.maximum(weights, 0.0)), 0.0)
        dtype = positions.dtype
        k = rim.shape[0]

        zero_val = jnp.zeros((k, 3), dtype)
        zero_row = jnp.zeros((k,), jnp.int32)
        if staggered:
            base_vals = [(coeff * w0)[:, None] * r_dir, (coeff * w1)[:, None] * r_dir]
            base_rows = [jnp.where(use, row0, 0), jnp.where(use, row1, 0)]
        else:
            base_vals = [coeff[:, None] * r_dir]
            base_rows = [jnp.where(use, rim, 0)]
        n_base = len(base_vals)

        out_vals = jnp.stack(base_vals + [zero_val], axis=1)  # (k, n_base+1, 3)
        out_rows = jnp.stack(base_rows + [zero_row], axis=1)
        out_leaf = jnp.ones(out_rows.shape, jnp.int32)  # outer leaflet

        if not has_disk:
            return out_vals[:, :n_base], out_rows[:, :n_base], out_leaf[:, :n_base]

        if disk_targeting:
            # physical_edge in-rows: one slot — coeff * raw r_hat at the
            # disk-boundary (rim) row, inner leaflet
            pad = [zero_val] * (n_base + 1 - 1)
            pad_rows = [zero_row] * (n_base + 1 - 1)
            in_vals = jnp.stack([coeff[:, None] * r_hat] + pad, axis=1)
            in_rows = jnp.stack([jnp.where(use, rim, 0)] + pad_rows, axis=1)
            in_leaf = jnp.zeros(in_rows.shape, jnp.int32)
            return (
                jnp.concatenate([out_vals, in_vals], axis=0),
                jnp.concatenate([out_rows, in_rows], axis=0),
                jnp.concatenate([out_leaf, in_leaf], axis=0),
            )

        disk, dgood, disk_r_hat, dw = _disk_geometry(positions, topo, dtype)
        if local_disk:
            in_vals = jnp.stack(
                base_vals
                + [jnp.where(dgood[:, None], -coeff[:, None] * disk_r_hat, 0.0)],
                axis=1,
            )
            in_rows = jnp.stack(base_rows + [jnp.where(dgood, disk, 0)], axis=1)
            in_leaf = jnp.zeros(in_rows.shape, jnp.int32)  # inner leaflet
            return (
                jnp.concatenate([out_vals, in_vals], axis=0),
                jnp.concatenate([out_rows, in_rows], axis=0),
                jnp.concatenate([out_leaf, in_leaf], axis=0),
            )

        # shared-mean-field mode: row_i = slot_i + bg_coeff_i * bg_field with
        # the background the (leaflet-in) arc-length-mean disk direction
        # field — identical arithmetic to the dense form's `shared` term
        wsum = jnp.sum(jnp.where(dgood, dw, 0.0))
        mean_dirs = (dw / _fmax_tiny(wsum))[:, None] * disk_r_hat
        shared_in = jnp.zeros((n_rows, 3), dtype).at[disk].add(
            jnp.where(dgood[:, None], mean_dirs, 0.0)
        )
        bg_field = jnp.stack([shared_in, jnp.zeros((n_rows, 3), dtype)])  # (2, Nv, 3)
        in_vals = jnp.stack(base_vals, axis=1)  # (k, n_base, 3)
        in_rows = jnp.stack(base_rows, axis=1)
        in_leaf = jnp.zeros(in_rows.shape, jnp.int32)
        bg_coeff = jnp.concatenate([jnp.zeros((k,), dtype), -coeff])
        return (
            jnp.concatenate([out_vals[:, :n_base], in_vals], axis=0),
            jnp.concatenate([out_rows[:, :n_base], in_rows], axis=0),
            jnp.concatenate([out_leaf[:, :n_base], in_leaf], axis=0),
            bg_coeff,
            bg_field,
        )

    return fn


def make_constraint_gradient_rows(spec):
    """Shape KKT rows tying rim/outer heights (one per condition per rim vertex)."""
    flags = _spec_flags(spec)
    if flags is None:
        return lambda state, topo, params: None
    has_disk, interp_outer, _local_disk, _theta_is_param = flags
    ring_average = _spec_ring_average(spec)

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, _phi, inv_dr, _r_hat, weights, normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        outer = _x(topo, "outer")
        idx0, idx1, w0, w1 = omap
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
            .at[idx, outer[idx0]]
            .add(-(coeff * w0)[:, None] * nvec)
            .at[idx, outer[idx1]]
            .add(-(coeff * w1)[:, None] * nvec)
        )
        if ring_average:
            # one aggregate shape condition (the in-family aggregate is its
            # exact negation and is dropped, as in the pointwise case below)
            g_out = jnp.sum(g_out, axis=0, keepdims=True)
        # Deliberate divergence from the reference: with a disk group the
        # reference ALSO stacks the in-condition rows, which are the EXACT
        # negations of the out rows (rim_slope_match_gradients.py:374-390,
        # vecs_in = -vecs_out).  That makes its joint KKT normal matrix
        # exactly singular; LAPACK then either flags it (projection skipped,
        # constraint_projection.py:126-128) or — depending on rounding —
        # returns unusably large multipliers that corrupt the projected
        # gradient and reject every line-search trial.  The negated rows
        # span the same constraint space, so we keep only the out rows:
        # identical feasible projection, well-conditioned system.  See
        # tools/ref_kkt_pathology_repro.py for the recorded reference
        # behavior this replaces.
        return g_out

    return fn


def make_compact_constraint_rows(spec):
    """Compact-support form of the shape rows: (values (K, 3, 3), rows (K, 3)).

    Each rim condition touches only the rim vertex and its (up to two)
    interpolated outer vertices, so the KKT projector can assemble the
    normal equations from slots in O(K^2 s^2) instead of O(K^2 Nv)
    (jit_core.make_gradient_projector channel 2).  Values match the dense
    rows of make_constraint_gradient_rows.
    """
    flags = _spec_flags(spec)
    if flags is None:
        return None
    if _spec_ring_average(spec):
        return None  # aggregate row is not compact-representable
    has_disk, interp_outer, _local_disk, _theta_is_param = flags

    def fn(state, topo, params):
        if "constraint:rim_slope_match_out/rim" not in topo.extras:
            return None
        positions = state.positions
        valid, _phi, inv_dr, _r_hat, weights, normal, omap = matching_data(
            positions, topo, params, interp_outer=interp_outer
        )
        rim = _x(topo, "rim")
        outer = _x(topo, "outer")
        idx0, idx1, w0, w1 = omap
        k = rim.shape[0]
        dtype = positions.dtype
        coeff = jnp.where(valid, jnp.sqrt(jnp.maximum(weights, 0.0)) * inv_dr, 0.0)
        nvec = jnp.asarray(normal, dtype)
        n_rows = positions.shape[0]
        slot_vals = jnp.stack(
            [
                coeff[:, None] * nvec,
                -(coeff * w0)[:, None] * nvec,
                -(coeff * w1)[:, None] * nvec,
            ],
            axis=1,
        )  # (k, 3, 3)
        slot_rows = jnp.stack([rim, outer[idx0], outer[idx1]], axis=1)  # (k, 3)
        slot_rows = jnp.where(
            jnp.broadcast_to(valid[:, None], slot_rows.shape), slot_rows, n_rows - 1
        )
        # in-condition rows are exact negations of the out rows and are
        # dropped (span-preserving; see make_constraint_gradient_rows)
        return slot_vals, slot_rows

    return fn
