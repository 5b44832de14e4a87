"""Hard per-leaflet in-plane tilt matching between disk and rim rings.

Parity: reference ``modules/constraints/tilt_vector_match_rim.py`` — vertices
tagged (``tilt_vector_match_group``, ``tilt_vector_match_role`` in
{disk, rim}) pair per group by polar angle in the group's local frame
(center = mean of both rings, normal = disk-ring plane fit); equal ring
counts only (unequal groups are skipped, as in the reference).  Per group and
per basis vector (u, v), one aggregated KKT row per leaflet:
+dvec at rim rows, -dvec at disk rows.  ``enforce_tilts`` snaps each pair's
in-plane components to the mode target (``tilt_vector_match_mode``: average /
rim_to_disk / disk_to_rim), honoring fixed flags.  Pairing and bases are
frozen at compile (the reference ignores their position dependence for
gradients too).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

_PREFIX = "constraint:tilt_vector_match_rim"


def _usable_group_count(mesh) -> int:
    """Groups with equal nonzero disk/rim member counts (the pairable ones)."""
    counts = defaultdict(lambda: {"disk": 0, "rim": 0})
    for vid in mesh.vertices:
        opts = mesh.vertices[vid].options or {}
        group = opts.get("tilt_vector_match_group")
        role = str(opts.get("tilt_vector_match_role") or "").strip().lower()
        if group is not None and role in {"disk", "rim"}:
            counts[str(group)][role] += 1
    return sum(
        1 for c in counts.values() if c["disk"] and c["disk"] == c["rim"]
    )


def compile_static(layout):
    gp = layout.mesh.global_parameters
    mode = str(gp.get("tilt_vector_match_mode") or "average").strip().lower()
    if mode in {"rim_to_disk", "rim2disk"}:
        mode = "rim_to_disk"
    elif mode in {"disk_to_rim", "disk2rim"}:
        mode = "disk_to_rim"
    else:
        mode = "average"
    # group count must be static: the row builders unroll a Python loop over
    # groups, and extras leaves are traced under the jitted enforcer stack
    return (mode, _usable_group_count(layout.mesh))


def _order_by_angle(pos, center, normal):
    rel = pos - center
    rel = rel - np.outer(rel @ normal, normal)
    trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
    u = trial - (trial @ normal) * normal
    u /= max(np.linalg.norm(u), 1e-15)
    v = np.cross(normal, u)
    return np.argsort(np.arctan2(rel @ v, rel @ u))


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    grouped = defaultdict(lambda: {"disk": [], "rim": []})
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        group = opts.get("tilt_vector_match_group")
        role = str(opts.get("tilt_vector_match_role") or "").strip().lower()
        if group is None or role not in {"disk", "rim"}:
            continue
        grouped[str(group)][role].append(layout.row_of[int(vid)])

    pairs_rim, pairs_disk, gids, us, vs = [], [], [], [], []
    gid = 0
    for group in sorted(grouped):
        disk = np.asarray(grouped[group]["disk"], dtype=int)
        rim = np.asarray(grouped[group]["rim"], dtype=int)
        if disk.size == 0 or rim.size == 0 or disk.size != rim.size:
            continue
        pos = np.array(
            [mesh.vertices[int(layout.vertex_ids[r])].position for r in range(len(layout.vertex_ids))]
        )
        disk_pos = pos[disk]
        rim_pos = pos[rim]
        center = np.mean(np.vstack([disk_pos, rim_pos]), axis=0)
        centroid = disk_pos.mean(axis=0)
        _, _, vh = np.linalg.svd(disk_pos - centroid, full_matrices=False)
        normal = vh[-1]
        disk = disk[_order_by_angle(disk_pos, center, normal)]
        rim = rim[_order_by_angle(rim_pos, center, normal)]
        trial = np.array([1.0, 0, 0]) if abs(normal[0]) <= 0.9 else np.array([0, 1.0, 0])
        u = trial - float(trial @ normal) * normal
        u /= max(np.linalg.norm(u), 1e-15)
        v = np.cross(normal, u)
        v /= max(np.linalg.norm(v), 1e-15)
        pairs_rim.extend(rim.tolist())
        pairs_disk.extend(disk.tolist())
        gids.extend([gid] * rim.size)
        us.append(u)
        vs.append(v)
        gid += 1

    if not pairs_rim:
        return {
            "rim": np.zeros(1, dtype=np.int32),
            "disk": np.zeros(1, dtype=np.int32),
            "gid": np.zeros(1, dtype=np.int32),
            "valid": np.zeros(1, dtype=bool),
            "u": np.zeros((1, 3)),
            "v": np.zeros((1, 3)),
            "n_groups": np.asarray(0),
        }
    n = len(pairs_rim)
    nc = 1
    while nc < n:
        nc *= 2
    pad = layout.pad_rows
    return {
        "rim": pad(np.asarray(pairs_rim, dtype=np.int32), nc, 0),
        "disk": pad(np.asarray(pairs_disk, dtype=np.int32), nc, 0),
        "gid": pad(np.asarray(gids, dtype=np.int32), nc, 0),
        "valid": pad(np.ones(n, dtype=bool), nc, False),
        "u": np.asarray(us),
        "v": np.asarray(vs),
        "n_groups": np.asarray(gid),
    }


def make_tilt_constraint_rows(spec):
    n_groups = spec.static_of(_PREFIX, ("average", 0))[1]

    def fn(state, topo, params):
        if f"{_PREFIX}/rim" not in topo.extras or n_groups == 0:
            return None
        x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
        rim = x("rim")
        disk = x("disk")
        gidx = x("gid")
        valid = x("valid")
        dtype = state.positions.dtype
        n_rows = state.positions.shape[0]
        rows = []
        zeros = jnp.zeros((n_rows, 3), dtype)
        for g in range(n_groups):
            in_group = valid & (gidx == g)
            for key in ("u", "v"):
                dvec = jnp.asarray(x(key)[g], dtype)
                grad = (
                    jnp.zeros((n_rows, 3), dtype)
                    .at[rim]
                    .add(jnp.where(in_group[:, None], dvec, 0.0))
                    .at[disk]
                    .add(jnp.where(in_group[:, None], -dvec, 0.0))
                )
                rows.append(jnp.stack([grad, zeros], axis=0))  # in-leaflet row
                rows.append(jnp.stack([zeros, grad], axis=0))  # out-leaflet row
        return jnp.stack(rows, axis=0)

    return fn


def make_enforce_tilts(spec):
    static = spec.static_of(_PREFIX, ("average", 0))
    mode, n_groups = static[0], static[1]

    def enforce(state, topo, params):
        if f"{_PREFIX}/rim" not in topo.extras or n_groups == 0:
            return state
        x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
        rim = x("rim")
        disk = x("disk")
        gidx = x("gid")
        valid = x("valid")
        dtype = state.positions.dtype
        u = jnp.asarray(x("u"), dtype)[gidx]  # (k, 3) per-pair basis
        v = jnp.asarray(x("v"), dtype)[gidx]

        def project(tilts, fixed_mask, mode):
            d_fix = fixed_mask[disk]
            r_fix = fixed_mask[rim]
            cd = jnp.stack(
                [jnp.sum(tilts[disk] * u, axis=1), jnp.sum(tilts[disk] * v, axis=1)],
                axis=1,
            )
            cr = jnp.stack(
                [jnp.sum(tilts[rim] * u, axis=1), jnp.sum(tilts[rim] * v, axis=1)],
                axis=1,
            )
            if mode == "rim_to_disk":
                target = cr
            elif mode == "disk_to_rim":
                target = cd
            else:
                target = 0.5 * (cd + cr)
                target = jnp.where(d_fix[:, None], cd, target)
                target = jnp.where(r_fix[:, None], cr, target)
            both = d_fix & r_fix
            ok_d = valid & ~d_fix & ~both
            ok_r = valid & ~r_fix & ~both
            dd = (target[:, 0] - cd[:, 0])[:, None] * u + (
                target[:, 1] - cd[:, 1]
            )[:, None] * v
            dr = (target[:, 0] - cr[:, 0])[:, None] * u + (
                target[:, 1] - cr[:, 1]
            )[:, None] * v
            return tilts.at[disk].add(jnp.where(ok_d[:, None], dd, 0.0)).at[rim].add(
                jnp.where(ok_r[:, None], dr, 0.0)
            )

        tin = project(state.tilts_in, topo.tilt_fixed_in_mask, mode)
        tout = project(state.tilts_out, topo.tilt_fixed_out_mask, mode)
        return dataclasses.replace(state, tilts_in=tin, tilts_out=tout)

    return enforce
