"""Inner-leaflet disk contact driving term (Kozlov/Barnoy F_cont).

Parity: reference ``modules/energy/tilt_disk_contact_in.py``:

    F_cont = -2 pi R_eff gamma theta_B
    theta_B = arc-length-weighted mean of (t_in . r_hat) over the ring
    R_eff   = arc-length-weighted mean radius

over vertices tagged ``rim_slope_match_group == group`` or
``tilt_disk_contact_group == group`` (group key ``tilt_disk_contact_group_in``
falling back to ``rim_slope_match_disk_group``).  gamma resolves from
``tilt_disk_contact_strength_in`` or the ``tilt_disk_contact_*`` contact
parameters h * (delta_epsilon / a) with optional si-unit conversion.  Exact
tilt gradient (the weighted-mean backprop); positions stop-gradiented (the
reference contributes no shape gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

USES_TILT_LEAFLETS = True
IS_EXTERNAL_WORK = True


def _resolve_gamma(gp) -> float:
    val = gp.get("tilt_disk_contact_strength_in")
    if val is not None:
        return float(val or 0.0)

    def get_key(base):
        got = gp.get(f"{base}_in")
        return gp.get(base) if got is None else got

    h = get_key("tilt_disk_contact_h")
    if h is None:
        return 0.0
    over = get_key("tilt_disk_contact_delta_epsilon_over_a")
    if over is None:
        de = get_key("tilt_disk_contact_delta_epsilon")
        a = get_key("tilt_disk_contact_a")
        if de is None or a is None:
            return 0.0
        over = float(de) / float(a)
    raw = float(h) * float(over)
    units = str(gp.get("tilt_disk_contact_units") or "solver").strip().lower()
    if units in {"si", "physical", "physical_si"}:
        l0 = gp.get("tilt_disk_contact_length_unit_m")
        kref = gp.get("tilt_disk_contact_kappa_ref_J")
        if l0 is not None and kref is not None:
            l0, kref = float(l0), float(kref)
            if abs(l0) > 1e-30 and abs(kref) > 1e-30:
                return raw * l0 / kref
    return raw


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    gp = mesh.global_parameters
    empty = {
        "rows": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "center": np.zeros(3),
        "normal": np.array([0.0, 0.0, 1.0]),
        "has_normal": np.asarray(False),
        "gamma": np.asarray(0.0),
    }
    raw_group = gp.get("tilt_disk_contact_group_in") or gp.get(
        "rim_slope_match_disk_group"
    )
    if raw_group is None or not str(raw_group).strip():
        return empty
    group = str(raw_group).strip()
    rows = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        if (
            opts.get("rim_slope_match_group") == group
            or opts.get("tilt_disk_contact_group") == group
        ):
            rows.append(layout.row_of[int(vid)])
    if not rows:
        return empty
    center = np.asarray(gp.get("tilt_disk_contact_center") or [0, 0, 0], dtype=float)
    raw_n = gp.get("tilt_disk_contact_normal")
    if raw_n is not None:
        normal = np.asarray(raw_n, dtype=float).reshape(3)
        normal /= max(np.linalg.norm(normal), 1e-15)
        has_normal = True
    else:
        normal = np.array([0.0, 0.0, 1.0])
        has_normal = False
    # compile-time angular ordering (ring order is stable under minimization)
    pos = np.array(
        [layout.mesh.vertices[int(layout.vertex_ids[r])].position for r in rows]
    )
    if len(rows) >= 2:
        rel = pos - center
        rel -= np.outer(rel @ normal, normal)
        trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
        u = trial - (trial @ normal) * normal
        u /= max(np.linalg.norm(u), 1e-15)
        v = np.cross(normal, u)
        order = np.argsort(np.arctan2(rel @ v, rel @ u))
        rows = [rows[i] for i in order]
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
        "has_normal": np.asarray(has_normal),
        "gamma": np.asarray(_resolve_gamma(gp)),
    }


def energy(geo, state, topo, params):
    dtype = state.positions.dtype
    if "energy:tilt_disk_contact_in/rows" not in topo.extras:
        return jnp.asarray(0.0, dtype)
    x = lambda k: topo.extras[f"energy:tilt_disk_contact_in/{k}"]  # noqa: E731
    rows = x("rows")
    valid = x("valid")
    gamma = params.get("tilt_disk_contact_strength_in", jnp.asarray(x("gamma"), dtype))

    frozen = jax.lax.stop_gradient(state.positions)
    center = jnp.asarray(x("center"), dtype)
    normal = jnp.asarray(x("normal"), dtype)
    pts = frozen[rows]

    k = rows.shape[0]
    idx = jnp.arange(k)
    n_live = jnp.sum(valid.astype(jnp.int32))
    nxt = jnp.where(idx + 1 >= n_live, 0, idx + 1)
    prv = jnp.where(idx - 1 < 0, n_live - 1, idx - 1)
    l_next = jnp.linalg.norm(pts[nxt] - pts, axis=1)
    l_prev = jnp.linalg.norm(pts - pts[prv], axis=1)
    weights = jnp.where(valid, 0.5 * (l_next + l_prev), 0.0)

    rel = pts - center
    rel_p = rel - jnp.sum(rel * normal, axis=1, keepdims=True) * normal
    r_len = jnp.linalg.norm(rel_p, axis=1)
    good = valid & (r_len > 1e-12)
    r_hat = jnp.where(good[:, None], rel_p / jnp.maximum(r_len, 1e-12)[:, None], 0.0)
    weights = jnp.where(good, weights, 0.0)
    wsum = jnp.sum(weights)

    theta_vals = jnp.sum(state.tilts_in[rows] * r_hat, axis=1)
    theta_B = jnp.sum(weights * theta_vals) / jnp.maximum(wsum, 1e-12)
    r_eff = jnp.sum(weights * r_len) / jnp.maximum(wsum, 1e-12)
    return -2.0 * jnp.pi * r_eff * gamma * theta_B
