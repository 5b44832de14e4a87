"""Pin tagged vertices (and endpoints of tagged edges) to a circle.

Parity: reference ``modules/constraints/pin_to_circle.py``:
- circle = (plane normal, center point, radius) per entity/global in "fixed"
  mode; "fit" mode best-fits center/radius (and normal unless given) from the
  tagged group's current positions; "slide" mode translates the center along a
  fixed normal (mean offset) and fits the radius unless given.
- geometric enforcement projects every tagged vertex onto its circle
  (including `fixed` vertices — the rings are usually fixed and must stay
  exactly circular after mesh operations); in mesh_operation/finalize
  contexts, groups listed in ``pin_to_circle_mesh_operation_preserve_normal_
  groups`` keep their normal offset when projected.
- KKT rows: two per movable pinned vertex (plane normal + radial direction),
  reference pin_to_circle.py:551-699.
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


def _has(options):
    cons = (options or {}).get("constraints")
    return cons == "pin_to_circle" or (isinstance(cons, list) and "pin_to_circle" in cons)


def _mode_code(mesh, options) -> int:
    raw = (options or {}).get("pin_to_circle_mode")
    if raw is None:
        raw = mesh.global_parameters.get("pin_to_circle_mode")
    mode = str(raw or "fixed").lower()
    if mode == "fit":
        return MODE_FIT
    if mode in {"slide", "normal", "normal_only", "slide_normal"}:
        return MODE_SLIDE
    return MODE_FIXED


def _pick(mesh, options, key, default=None):
    val = (options or {}).get(key)
    if val is None:
        val = mesh.global_parameters.get(key)
    return default if val is None else val


def _default_tangent_np(normal):
    trial = np.array([1.0, 0.0, 0.0])
    if abs(np.dot(trial, normal)) > 0.9:
        trial = np.array([0.0, 1.0, 0.0])
    t = trial - np.dot(trial, normal) * normal
    n = np.linalg.norm(t)
    return t / n if n > 1e-15 else np.array([1.0, 0.0, 0.0])


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    fixed_entries = []  # (vid, normal, center, radius, preserve)
    group_names: dict = {}
    group_members: dict = {}
    group_meta: dict = {}

    preserve_raw = mesh.global_parameters.get(
        "pin_to_circle_mesh_operation_preserve_normal_groups"
    )
    if preserve_raw is None:
        preserve_set = set()
    elif isinstance(preserve_raw, str):
        preserve_set = {preserve_raw.strip()}
    else:
        preserve_set = {str(x).strip() for x in preserve_raw}

    def note(vid, options):
        mode = _mode_code(mesh, options)
        group = str(_pick(mesh, options, "pin_to_circle_group", "default") or "default")
        if mode == MODE_FIXED:
            normal = np.asarray(
                _pick(mesh, options, "pin_to_circle_normal", [0, 0, 1]), dtype=float
            )
            nn = np.linalg.norm(normal)
            if nn < 1e-15:
                return
            normal = normal / nn
            center = np.asarray(
                _pick(mesh, options, "pin_to_circle_point", [0, 0, 0]), dtype=float
            )
            radius = float(_pick(mesh, options, "pin_to_circle_radius", 1.0))
            if radius <= 0:
                return
            fixed_entries.append((int(vid), normal, center, radius, group in preserve_set))
        else:
            g = group_names.setdefault(group, len(group_names))
            group_members.setdefault(g, set()).add(int(vid))
            meta = group_meta.setdefault(
                g,
                {
                    "mode": mode,
                    "normal": None,
                    "radius": None,
                    "point": None,
                    "preserve": group in preserve_set,
                },
            )
            meta["mode"] = mode
            for key, mkey in (
                ("pin_to_circle_normal", "normal"),
                ("pin_to_circle_radius", "radius"),
                ("pin_to_circle_point", "point"),
            ):
                if meta[mkey] is None:
                    val = _pick(mesh, options, key)
                    if val is not None:
                        meta[mkey] = np.asarray(val, dtype=float) if mkey != "radius" else float(val)

    for vid, vertex in mesh.vertices.items():
        if _has(vertex.options):
            note(vid, vertex.options)
    for edge in mesh.edges.values():
        if _has(edge.options):
            note(edge.tail_index, edge.options)
            note(edge.head_index, edge.options)

    # fixed-mode table (duplicates preserved: matches the reference's
    # per-entity projection and per-duplicate KKT rows)
    kf = max(len(fixed_entries), 1)
    kfc = 1
    while kfc < kf:
        kfc *= 2
    f_rows = np.zeros(kf, dtype=np.int32)
    f_valid = np.zeros(kf, dtype=bool)
    f_normal = np.tile(np.array([0.0, 0.0, 1.0]), (kf, 1))
    f_center = np.zeros((kf, 3))
    f_radius = np.ones(kf)
    f_preserve = np.zeros(kf, dtype=bool)
    f_vfixed = np.zeros(kf, dtype=bool)
    for i, (vid, normal, center, radius, preserve) in enumerate(fixed_entries):
        f_rows[i] = layout.row_of[vid]
        f_valid[i] = True
        f_normal[i] = normal
        f_center[i] = center
        f_radius[i] = radius
        f_preserve[i] = preserve
        f_vfixed[i] = bool(mesh.vertices[vid].fixed)

    # group (fit/slide) tables
    g_count = max(len(group_names), 1)
    members = []  # (group, row, vertex_fixed)
    for g in sorted(group_members):
        for vid in sorted(group_members[g]):
            members.append((g, layout.row_of[vid], bool(mesh.vertices[vid].fixed)))
    km = max(len(members), 1)
    kmc = 1
    while kmc < km:
        kmc *= 2
    m_group = np.zeros(km, dtype=np.int32)
    m_rows = np.zeros(km, dtype=np.int32)
    m_valid = np.zeros(km, dtype=bool)
    m_vfixed = np.zeros(km, dtype=bool)
    for i, (g, row, vf) in enumerate(members):
        m_group[i], m_rows[i], m_valid[i], m_vfixed[i] = g, row, True, vf

    g_mode = np.zeros(g_count, dtype=np.int32)
    g_normal = np.tile(np.array([0.0, 0.0, 1.0]), (g_count, 1))
    g_has_normal = np.zeros(g_count, dtype=bool)
    g_radius = np.ones(g_count)
    g_has_radius = np.zeros(g_count, dtype=bool)
    g_point = np.zeros((g_count, 3))
    g_preserve = np.zeros(g_count, dtype=bool)
    for g, meta in group_meta.items():
        g_mode[g] = meta["mode"]
        if meta["normal"] is not None:
            n = meta["normal"]
            nn = np.linalg.norm(n)
            if nn > 1e-15:
                g_normal[g] = n / nn
                g_has_normal[g] = True
        if meta["radius"] is not None:
            g_radius[g] = meta["radius"]
            g_has_radius[g] = True
        if meta["point"] is not None:
            g_point[g] = meta["point"]
        g_preserve[g] = meta["preserve"]

    pad = layout.pad_rows
    return {
        "f_rows": pad(f_rows, kfc, 0),
        "f_valid": pad(f_valid, kfc, False),
        "f_normal": pad(f_normal, kfc, 0.0),
        "f_center": pad(f_center, kfc, 0.0),
        "f_radius": pad(f_radius, kfc, 1.0),
        "f_preserve": pad(f_preserve, kfc, False),
        "f_vfixed": pad(f_vfixed, kfc, False),
        "m_group": pad(m_group, kmc, 0),
        "m_rows": pad(m_rows, kmc, 0),
        "m_valid": pad(m_valid, kmc, False),
        "m_vfixed": pad(m_vfixed, kmc, False),
        "g_mode": g_mode,
        "g_normal": g_normal,
        "g_has_normal": g_has_normal,
        "g_radius": g_radius,
        "g_has_radius": g_has_radius,
        "g_point": g_point,
        "g_preserve": g_preserve,
    }


def _x(topo, key):
    return topo.extras[f"constraint:pin_to_circle/{key}"]


def _any_compile_time(topo, key) -> bool:
    """True when the padded table can contain live entries.

    Works both outside jit (value check) and under tracing (shape>1 heuristic:
    empty tables compile to a single invalid row, see compile_topology).
    """
    arr = _x(topo, key)
    if hasattr(arr, "aval") and not isinstance(arr, np.ndarray):
        try:
            return bool(np.any(np.asarray(arr)))
        except Exception:
            return arr.shape[0] > 1 or True
    return bool(np.any(np.asarray(arr)))


def _default_tangent(normal):
    cond = (jnp.abs(normal[..., 0]) > 0.9)[..., None]
    trial = jnp.where(
        cond,
        jnp.array([0.0, 1.0, 0.0], dtype=normal.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=normal.dtype),
    )
    t = trial - jnp.sum(trial * normal, axis=-1, keepdims=True) * normal
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    return jnp.where(n > 1e-15, t / jnp.maximum(n, 1e-15), trial)


def _group_circles(positions, topo):
    """Resolve (normal, center, radius) for each fit/slide group on device."""
    dtype = positions.dtype
    rows = _x(topo, "m_rows")
    valid = _x(topo, "m_valid")
    group = _x(topo, "m_group")
    g_count = _x(topo, "g_mode").shape[0]
    w = valid.astype(dtype)

    pts = positions[rows]
    counts = jnp.zeros((g_count,), dtype).at[group].add(w)
    centroid = (
        jnp.zeros((g_count, 3), dtype).at[group].add(pts * w[:, None])
        / jnp.maximum(counts, 1.0)[:, None]
    )

    # PCA normal from the 3x3 scatter matrix when no hint is given
    centered = (pts - centroid[group]) * w[:, None]
    cov = jnp.zeros((g_count, 3, 3), dtype).at[group].add(
        centered[:, :, None] * centered[:, None, :]
    )
    fit_normal = jax.vmap(dlinalg.smallest_eigvec_3x3)(cov)
    base_normal = jnp.asarray(_x(topo, "g_normal"), dtype)
    has_normal = _x(topo, "g_has_normal")
    normal = jnp.where(has_normal[:, None], base_normal, fit_normal)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=1, keepdims=True), 1e-15)

    is_slide = _x(topo, "g_mode") == MODE_SLIDE
    # slide: center = base_point + mean((p - base_point) . n) * n
    base_point = jnp.asarray(_x(topo, "g_point"), dtype)
    offs = jnp.sum((pts - base_point[group]) * normal[group], axis=1) * w
    mean_off = jnp.zeros((g_count,), dtype).at[group].add(offs) / jnp.maximum(counts, 1.0)
    slide_center = base_point + mean_off[:, None] * normal

    # fit: algebraic least-squares circle in the group plane through centroid
    u = _default_tangent(normal)
    v = jnp.cross(normal, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-15)
    rel = pts - centroid[group]
    rel_in_plane = rel - jnp.sum(rel * normal[group], axis=1, keepdims=True) * normal[group]
    x = jnp.sum(rel_in_plane * u[group], axis=1) * w
    y = jnp.sum(rel_in_plane * v[group], axis=1) * w
    b = (x * x + y * y) * w
    # normal equations of A=[2x,2y,1], b=x^2+y^2 per group
    def seg(val):
        return jnp.zeros((g_count,), dtype).at[group].add(val)

    Sxx, Sxy, Syy = seg(4 * x * x), seg(4 * x * y), seg(4 * y * y)
    Sx, Sy, S1 = seg(2 * x * w), seg(2 * y * w), counts
    Bx, By, B1 = seg(2 * x * b), seg(2 * y * b), seg(b)
    A = jnp.stack(
        [
            jnp.stack([Sxx, Sxy, Sx], axis=1),
            jnp.stack([Sxy, Syy, Sy], axis=1),
            jnp.stack([Sx, Sy, S1], axis=1),
        ],
        axis=1,
    )
    rhs = jnp.stack([Bx, By, B1], axis=1)
    sol = jax.vmap(dlinalg.solve_spd)(A + 1e-18 * jnp.eye(3, dtype=dtype)[None], rhs)
    a_c, b_c, d_c = sol[:, 0], sol[:, 1], sol[:, 2]
    r_fit = jnp.sqrt(jnp.maximum(d_c + a_c**2 + b_c**2, 1e-18))
    fit_center = centroid + a_c[:, None] * u + b_c[:, None] * v

    # slide radius: mean radial distance in plane
    radial = rel_in_plane - (slide_center - centroid)[group]
    slide_r = seg(jnp.linalg.norm(radial, axis=1) * w) / jnp.maximum(counts, 1.0)

    center = jnp.where(is_slide[:, None], slide_center, fit_center)
    radius = jnp.where(is_slide, slide_r, r_fit)
    radius = jnp.where(_x(topo, "g_has_radius"), jnp.asarray(_x(topo, "g_radius"), dtype), radius)
    return normal, center, radius


def _project_rows(positions, rows, valid, normal, center, radius, preserve, preserve_on):
    pts = positions[rows]
    off_n = jnp.sum((pts - center) * normal, axis=1)
    pos_plane = pts - off_n[:, None] * normal
    offset = pos_plane - center
    onorm = jnp.linalg.norm(offset, axis=1)
    tangent = jnp.where(
        onorm[:, None] > 1e-15,
        offset / jnp.maximum(onorm, 1e-15)[:, None],
        _default_tangent(normal),
    )
    projected = center + radius[:, None] * tangent
    keep_normal = preserve & preserve_on
    projected = jnp.where(keep_normal[:, None], projected + off_n[:, None] * normal, projected)
    new_pts = jnp.where(valid[:, None], projected, pts)
    # drop padding entries (rows pads with 0): a plain .set would let a
    # later padding entry write row 0's pre-projection position back,
    # silently undoing the projection whenever vertex row 0 is pinned
    nv = positions.shape[0]
    safe_rows = jnp.where(valid, rows, nv)
    return positions.at[safe_rows].set(
        jnp.where(valid[:, None], new_pts, 0.0), mode="drop"
    )


def enforce(state, topo, params, context: str = "minimize"):
    positions = state.positions
    preserve_on = jnp.asarray(context in {"mesh_operation", "finalize"})

    f_valid = _x(topo, "f_valid")
    if _any_compile_time(topo, "f_valid"):
        positions = _project_rows(
            positions,
            _x(topo, "f_rows"),
            f_valid,
            jnp.asarray(_x(topo, "f_normal"), positions.dtype),
            jnp.asarray(_x(topo, "f_center"), positions.dtype),
            jnp.asarray(_x(topo, "f_radius"), positions.dtype),
            _x(topo, "f_preserve"),
            preserve_on,
        )

    m_valid = _x(topo, "m_valid")
    if _any_compile_time(topo, "m_valid"):
        g_normal, g_center, g_radius = _group_circles(positions, topo)
        group = _x(topo, "m_group")
        # groups with <3 members are skipped (cannot fit)
        counts = jnp.zeros((g_normal.shape[0],), positions.dtype).at[group].add(
            m_valid.astype(positions.dtype)
        )
        usable = m_valid & (counts[group] >= 3)
        positions = _project_rows(
            positions,
            _x(topo, "m_rows"),
            usable,
            g_normal[group],
            g_center[group],
            g_radius[group],
            _x(topo, "g_preserve")[group],
            preserve_on,
        )

    return dataclasses.replace(state, positions=positions)


def constraint_gradient_rows(state, topo, params):
    """Two KKT rows (plane + radial) per movable pinned vertex."""
    dtype = state.positions.dtype
    blocks = []

    def rows_for(rows, valid, normal, center):
        pts = state.positions[rows]
        pos_plane = pts - jnp.sum((pts - center) * normal, axis=1, keepdims=True) * normal
        radial = pos_plane - center
        rnorm = jnp.linalg.norm(radial, axis=1)
        radial_hat = jnp.where(
            rnorm[:, None] > 1e-15,
            radial / jnp.maximum(rnorm, 1e-15)[:, None],
            _default_tangent(normal),
        )
        k = rows.shape[0]
        nv = state.positions.shape[0]
        out = jnp.zeros((2 * k, nv, 3), dtype=dtype)
        idx = jnp.arange(k)
        out = out.at[2 * idx, rows].add(jnp.where(valid[:, None], normal, 0.0))
        out = out.at[2 * idx + 1, rows].add(jnp.where(valid[:, None], radial_hat, 0.0))
        return out

    f_valid = _x(topo, "f_valid") & ~_x(topo, "f_vfixed")
    if _any_compile_time(topo, "f_valid"):
        blocks.append(
            rows_for(
                _x(topo, "f_rows"),
                f_valid,
                jnp.asarray(_x(topo, "f_normal"), dtype),
                jnp.asarray(_x(topo, "f_center"), dtype),
            )
        )

    m_valid_all = _x(topo, "m_valid")
    if _any_compile_time(topo, "m_valid"):
        g_normal, g_center, _ = _group_circles(state.positions, topo)
        group = _x(topo, "m_group")
        m_valid = m_valid_all & ~_x(topo, "m_vfixed")
        blocks.append(
            rows_for(_x(topo, "m_rows"), m_valid, g_normal[group], g_center[group])
        )

    if not blocks:
        return None
    return jnp.concatenate(blocks, axis=0)


def local_constraint_normals(state, topo, params):
    """(Nv, 2, 3) per-vertex normals (plane + radial) — pin rows touch only
    their own vertex, so the projection is local (jit_core.make_gradient_projector)."""
    dtype = state.positions.dtype
    nv = state.positions.shape[0]
    out = jnp.zeros((nv, 2, 3), dtype=dtype)
    got_any = False

    def normals_for(rows, valid, normal, center):
        pts = state.positions[rows]
        pos_plane = pts - jnp.sum((pts - center) * normal, axis=1, keepdims=True) * normal
        radial = pos_plane - center
        rnorm = jnp.linalg.norm(radial, axis=1)
        radial_hat = jnp.where(
            rnorm[:, None] > 1e-15,
            radial / jnp.maximum(rnorm, 1e-15)[:, None],
            _default_tangent(normal),
        )
        n_pair = jnp.stack(
            [jnp.broadcast_to(normal, radial_hat.shape), radial_hat], axis=1
        )  # (k, 2, 3)
        return jnp.where(valid[:, None, None], n_pair, 0.0)

    if _any_compile_time(topo, "f_valid"):
        got_any = True
        rows = _x(topo, "f_rows")
        valid = _x(topo, "f_valid") & ~_x(topo, "f_vfixed")
        pair = normals_for(
            rows,
            valid,
            jnp.asarray(_x(topo, "f_normal"), dtype),
            jnp.asarray(_x(topo, "f_center"), dtype),
        )
        safe = jnp.where(valid, rows, nv)
        out = out.at[safe].add(pair, mode="drop")

    if _any_compile_time(topo, "m_valid"):
        got_any = True
        g_normal, g_center, _ = _group_circles(state.positions, topo)
        group = _x(topo, "m_group")
        rows = _x(topo, "m_rows")
        valid = _x(topo, "m_valid") & ~_x(topo, "m_vfixed")
        pair = normals_for(rows, valid, g_normal[group], g_center[group])
        safe = jnp.where(valid, rows, nv)
        out = out.at[safe].add(pair, mode="drop")

    return out if got_any else None
