"""Inner-leaflet theta_B contact work term (Kozlov scalar boundary mode).

Parity: reference ``modules/energy/tilt_thetaB_contact_in.py``:

    default ("scalar" work mode):  E = -2 pi R_eff gamma theta_B

with R_eff the arc-length-weighted effective radius of the theta_B group ring
(vertices tagged ``rim_slope_match_group == group`` or ``tilt_thetaB_group ==
group``).  The reference contributes NO gradients in this mode (the energy is
bookkeeping for the theory breakdown), so everything positional is
stop-gradiented.  The legacy quadratic penalty mode
(``tilt_thetaB_contact_penalty_mode: legacy``) adds
0.5 k sum w_i (t_in . r_hat - theta_B)^2 with its exact tilt gradient, and its
closed-form scalar update lives in ``update_scalar_params`` (host side).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

USES_TILT_LEAFLETS = True
IS_EXTERNAL_WORK = True


def _group_rows(layout):
    mesh = layout.mesh
    gp = mesh.global_parameters
    group = gp.get("tilt_thetaB_group_in") or gp.get("rim_slope_match_disk_group")
    if group is None:
        return [], None
    group = str(group).strip()
    rows = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        if opts.get("rim_slope_match_group") == group or opts.get("tilt_thetaB_group") == group:
            rows.append(layout.row_of[int(vid)])
    return rows, group


def compile_topology(layout) -> dict:
    rows, _ = _group_rows(layout)
    mesh = layout.mesh
    gp = mesh.global_parameters
    center = np.asarray(gp.get("tilt_thetaB_center") or [0, 0, 0], dtype=float)
    raw_n = gp.get("tilt_thetaB_normal")
    if raw_n is not None:
        normal = np.asarray(raw_n, dtype=float)
        nn = np.linalg.norm(normal)
        normal = normal / nn if nn > 1e-15 else np.array([0.0, 0.0, 1.0])
        has_normal = True
    else:
        normal = np.array([0.0, 0.0, 1.0])
        has_normal = False
    n = max(len(rows), 1)
    nc = 1
    while nc < n:
        nc *= 2
    # ring order fixed at compile time (pinned rings keep their angular order)
    pos = np.array([layout.mesh.vertices[int(layout.vertex_ids[r])].position for r in rows]) if rows else np.zeros((0, 3))
    if len(rows) >= 2:
        rel = pos - center
        rel -= np.outer(rel @ normal, normal)
        trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
        u = trial - (trial @ normal) * normal
        u /= max(np.linalg.norm(u), 1e-15)
        v = np.cross(normal, u)
        order = np.argsort(np.arctan2(rel @ v, rel @ u))
        rows = [rows[i] for i in order]
    return {
        "rows": layout.pad_rows(np.asarray(rows or [0], dtype=np.int32), nc, 0),
        "valid": layout.pad_rows(
            np.ones(len(rows), dtype=bool) if rows else np.zeros(1, dtype=bool), nc, False
        ),
        "center": center,
        "normal": normal,
        "has_normal": np.asarray(has_normal),
    }


def ring_geometry(positions, topo, params):
    """(valid mask, weights, r_hat, r_len, wsum, R_eff) for the theta_B ring."""
    rows = topo.extras["energy:tilt_thetaB_contact_in/rows"]
    valid = topo.extras["energy:tilt_thetaB_contact_in/valid"]
    center = jnp.asarray(topo.extras["energy:tilt_thetaB_contact_in/center"], positions.dtype)
    normal = jnp.asarray(topo.extras["energy:tilt_thetaB_contact_in/normal"], positions.dtype)
    pts = positions[rows]
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
    r_eff = jnp.sum(weights * r_len) / jnp.maximum(wsum, 1e-12)
    return good, weights, r_hat, r_len, wsum, r_eff


def make_energy(spec):
    penalty = spec.option("tilt_thetaB_contact_penalty_mode", "off").lower() in {
        "legacy",
        "on",
        "true",
        "1",
    }
    work_mode = spec.option("tilt_thetaB_contact_work_mode", "scalar").lower()

    def fn(geo, state, topo, params):
        dtype = state.positions.dtype
        if "energy:tilt_thetaB_contact_in/rows" not in topo.extras:
            return jnp.asarray(0.0, dtype)
        gamma = params.get("tilt_thetaB_contact_strength_in", jnp.asarray(0.0))
        k = params.get("tilt_thetaB_strength_in", jnp.asarray(0.0))
        theta_B = params.get("tilt_thetaB_value", jnp.asarray(0.0))
        rows = topo.extras["energy:tilt_thetaB_contact_in/rows"]
        good, weights, r_hat, r_len, wsum, r_eff = ring_geometry(
            jax.lax.stop_gradient(state.positions), topo, params
        )
        E = jnp.asarray(0.0, dtype)
        theta_vals = jnp.sum(state.tilts_in[rows] * r_hat, axis=1)
        if work_mode == "field_linear":
            theta_contact = jnp.sum(weights * theta_vals) / jnp.maximum(wsum, 1e-12)
        else:
            # scalar work: pure bookkeeping term, no gradients (reference
            # contributes none in this mode)
            theta_contact = jax.lax.stop_gradient(theta_B)
        E = E - 2.0 * jnp.pi * r_eff * gamma * theta_contact
        if penalty:
            diff = theta_vals - theta_B
            E = E + 0.5 * k * jnp.sum(jnp.where(good, weights * diff * diff, 0.0))
        return E

    return fn


def energy(geo, state, topo, params):
    return make_energy(type("S", (), {"option": lambda self, k, d="": d})())(
        geo, state, topo, params
    )


def make_tilt_frozen(spec):
    """Frozen-geometry split for the inner tilt solve (positions constant).

    The ring geometry is position-only (and already stop-gradiented in the
    full path); only the tilt projections onto r_hat change per iteration.
    In the default scalar work mode the whole term is constant in the tilts.
    """
    penalty = spec.option("tilt_thetaB_contact_penalty_mode", "off").lower() in {
        "legacy",
        "on",
        "true",
        "1",
    }
    work_mode = spec.option("tilt_thetaB_contact_work_mode", "scalar").lower()

    def precompute(state, topo, params):
        if "energy:tilt_thetaB_contact_in/rows" not in topo.extras:
            return {}
        good, weights, r_hat, _r_len, wsum, r_eff = ring_geometry(
            jax.lax.stop_gradient(state.positions), topo, params
        )
        return {
            "good": good,
            "weights": weights,
            "r_hat": r_hat,
            "wsum": wsum,
            "r_eff": r_eff,
        }

    def energy_fn(tin, tout, fr, topo, params, ctx=None):
        dtype = tin.dtype
        if not fr:
            return jnp.asarray(0.0, dtype)
        gamma = params.get("tilt_thetaB_contact_strength_in", jnp.asarray(0.0))
        k = params.get("tilt_thetaB_strength_in", jnp.asarray(0.0))
        theta_B = params.get("tilt_thetaB_value", jnp.asarray(0.0))
        rows = topo.extras["energy:tilt_thetaB_contact_in/rows"]
        E = jnp.asarray(0.0, dtype)
        theta_vals = jnp.sum(tin[rows] * fr["r_hat"], axis=1)
        if work_mode == "field_linear":
            theta_contact = jnp.sum(fr["weights"] * theta_vals) / jnp.maximum(
                fr["wsum"], 1e-12
            )
        else:
            theta_contact = jax.lax.stop_gradient(theta_B)
        E = E - 2.0 * jnp.pi * fr["r_eff"] * gamma * theta_contact
        if penalty:
            diff = theta_vals - theta_B
            E = E + 0.5 * k * jnp.sum(
                jnp.where(fr["good"], fr["weights"] * diff * diff, 0.0)
            )
        return E

    return precompute, energy_fn


def scalar_update_live(mesh, global_params) -> bool:
    """True when update_scalar_params would actually move theta_B.

    The minimizer uses this to decide whether it must fall back to
    per-iteration (chunk=1) host stepping: the closed-form update only runs
    in the opt-in legacy penalty mode (reference _penalty_mode:147-158
    defaults to "off"), with a resolvable group and k > 0.
    """
    mode = str(global_params.get("tilt_thetaB_contact_penalty_mode") or "off").lower()
    if mode not in {"legacy", "on", "true", "1"}:
        return False
    group = global_params.get("tilt_thetaB_group_in") or global_params.get(
        "rim_slope_match_disk_group"
    )
    if group is None:
        return False
    return float(global_params.get("tilt_thetaB_strength_in") or 0.0) > 0.0


def update_scalar_params(mesh, global_params, param_resolver) -> None:
    """Closed-form theta_B update (legacy penalty mode only) — host side.

    Parity: tilt_thetaB_contact_in.py:262-293.
    """
    mode = str(global_params.get("tilt_thetaB_contact_penalty_mode") or "off").lower()
    if mode not in {"legacy", "on", "true", "1"}:
        return
    group = global_params.get("tilt_thetaB_group_in") or global_params.get(
        "rim_slope_match_disk_group"
    )
    if group is None:
        return
    group = str(group).strip()
    center = np.asarray(global_params.get("tilt_thetaB_center") or [0, 0, 0], dtype=float)
    raw_n = global_params.get("tilt_thetaB_normal")
    rows = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        if opts.get("rim_slope_match_group") == group or opts.get("tilt_thetaB_group") == group:
            rows.append(vid)
    if not rows:
        return
    pos = np.array([mesh.vertices[v].position for v in rows])
    if raw_n is not None:
        normal = np.asarray(raw_n, dtype=float)
        normal /= max(np.linalg.norm(normal), 1e-15)
    else:
        centroid = pos.mean(axis=0)
        _, _, vh = np.linalg.svd(pos - centroid, full_matrices=False)
        normal = vh[-1]
    rel = pos - center
    rel -= np.outer(rel @ normal, normal)
    trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
    u = trial - (trial @ normal) * normal
    u /= max(np.linalg.norm(u), 1e-15)
    v = np.cross(normal, u)
    order = np.argsort(np.arctan2(rel @ v, rel @ u))
    rows = [rows[i] for i in order]
    pos = pos[order]
    n = len(rows)
    l_next = np.linalg.norm(pos[(np.arange(n) + 1) % n] - pos, axis=1)
    l_prev = np.linalg.norm(pos - pos[(np.arange(n) - 1) % n], axis=1)
    weights = 0.5 * (l_next + l_prev)
    rel = pos - center
    rel -= np.outer(rel @ normal, normal)
    r_len = np.linalg.norm(rel, axis=1)
    good = r_len > 1e-12
    if not np.any(good):
        return
    weights = weights[good]
    r_hat = rel[good] / r_len[good][:, None]
    wsum = float(np.sum(weights))
    if wsum <= 1e-12:
        return
    tilts = np.array([mesh.vertices[v].tilt_in for v in np.asarray(rows)[good]])
    theta_vals = np.einsum("ij,ij->i", tilts, r_hat)
    theta_mean = float(np.sum(weights * theta_vals) / wsum)
    r_eff = float(np.sum(weights * r_len[good]) / wsum)
    k = float(param_resolver.get(None, "tilt_thetaB_strength_in") or 0.0)
    gamma = float(param_resolver.get(None, "tilt_thetaB_contact_strength_in") or 0.0)
    if k <= 0.0:
        return
    theta_B = theta_mean + (2.0 * np.pi * r_eff * gamma) / (k * wsum)
    global_params.set("tilt_thetaB_value", float(theta_B))
