"""Rigid-body constraint on a disk patch.

Parity: reference ``modules/constraints/rigid_disk.py``:

- disk vertices selected by ``rigid_disk_group`` (vertex option
  ``rigid_disk_group``) or the ``preset: disk`` fallback;
- the REFERENCE configuration is the first-seen disk geometry (cached on the
  host mesh so refinement/recompiles keep the original shape);
- KKT shape rows: independent pairwise-distance invariants from an anchor
  triplet (a->all, b->rest, c->rest) with gradient (+diff at i, -diff at j),
  skipping fully-fixed pairs (rigid_disk.py:189-255);
- ``enforce``: Kabsch-project the disk onto the closest rigid transform of
  the reference; when a rim sub-group and ``rigid_disk_radius`` are present,
  re-pin the rim ring to the target radius in the transformed disk plane and
  re-fit (rigid_disk.py:355-394).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import linalg as dlinalg
from membrane_solver_tpu.utils.precision import fmax_tiny as _fmax_tiny

_PREFIX = "constraint:rigid_disk"


def _collect_vids(mesh, group):
    vids = []
    for vid in sorted(mesh.vertices):
        opts = mesh.vertices[vid].options or {}
        if group is not None:
            if str(opts.get("rigid_disk_group") or "") == group:
                vids.append(vid)
        elif str(opts.get("preset") or "") == "disk":
            vids.append(vid)
    return vids


def _anchor_pairs(ref: np.ndarray):
    """Independent distance pairs from an anchor triplet (rigid_disk.py:170-216)."""
    n = ref.shape[0]
    if n < 2:
        return []
    a = 0
    d = np.linalg.norm(ref - ref[a], axis=1)
    b = int(np.argmax(d))
    c = None
    if n >= 3:
        ab = ref[b] - ref[a]
        ab_n = ab / max(np.linalg.norm(ab), 1e-15)
        perp = ref - ref[a] - np.outer((ref - ref[a]) @ ab_n, ab_n)
        c = int(np.argmax(np.linalg.norm(perp, axis=1)))
        if c in (a, b):
            c = None
    pairs, seen = [], set()

    def add(i, j):
        if i == j:
            return
        key = (i, j) if i < j else (j, i)
        if key not in seen:
            seen.add(key)
            pairs.append(key)

    for i in range(n):
        if i != a:
            add(a, i)
    for i in range(n):
        if i not in {a, b}:
            add(b, i)
    if c is not None:
        for i in range(n):
            if i not in {a, b, c}:
                add(c, i)
    return pairs


def compile_topology(layout) -> dict:
    mesh = layout.mesh
    gp = mesh.global_parameters
    raw_group = gp.get("rigid_disk_group")
    group = str(raw_group).strip() if raw_group is not None else None
    vids = _collect_vids(mesh, group)
    empty = {
        "rows": np.zeros(1, dtype=np.int32),
        "valid": np.zeros(1, dtype=bool),
        "ref": np.zeros((1, 3)),
        "pairs": np.zeros((1, 2), dtype=np.int32),
        "pairs_valid": np.zeros(1, dtype=bool),
        "rim_local": np.zeros(1, dtype=np.int32),
        "rim_valid": np.zeros(1, dtype=bool),
        "target_radius": np.asarray(0.0),
        "has_radius": np.asarray(False),
    }
    if len(vids) < 2:
        return empty

    # first-seen reference configuration, persisted across recompiles
    cache = getattr(mesh, "_rigid_disk_ref", None)
    if cache is None:
        cache = {}
        setattr(mesh, "_rigid_disk_ref", cache)
    key = group or "<preset:disk>"
    entry = cache.get(key)
    if entry is None or entry["vids"] != vids:
        ref = np.array([mesh.vertices[v].position for v in vids], dtype=float)
        cache[key] = {"vids": list(vids), "ref": ref.copy()}
    ref = cache[key]["ref"]

    rim_group = str(gp.get("rigid_disk_rim_group") or "rim").strip() or "rim"
    rim_local = [
        i
        for i, v in enumerate(vids)
        if str((mesh.vertices[v].options or {}).get("preset") or "") == rim_group
        or str((mesh.vertices[v].options or {}).get("rim_slope_match_group") or "")
        == rim_group
    ]
    radius = gp.get("rigid_disk_radius")
    if radius is None:
        defs = getattr(mesh, "definitions", {}) or {}
        disk_def = defs.get("disk") if isinstance(defs.get("disk"), dict) else None
        if disk_def:
            radius = disk_def.get("pin_to_circle_radius")

    rows = [layout.row_of[int(v)] for v in vids]
    pairs = _anchor_pairs(ref)
    n, npairs, nrim = len(rows), max(len(pairs), 1), max(len(rim_local), 1)

    def cap(x):
        c = 1
        while c < x:
            c *= 2
        return c

    pad = layout.pad_rows
    return {
        "rows": pad(np.asarray(rows, dtype=np.int32), cap(n), 0),
        "valid": pad(np.ones(n, dtype=bool), cap(n), False),
        "ref": pad(ref, cap(n), 0.0),
        "pairs": pad(np.asarray(pairs or [(0, 0)], dtype=np.int32), cap(npairs), 0),
        "pairs_valid": pad(
            np.ones(len(pairs), dtype=bool) if pairs else np.zeros(1, dtype=bool),
            cap(npairs),
            False,
        ),
        "rim_local": pad(np.asarray(rim_local or [0], dtype=np.int32), cap(nrim), 0),
        "rim_valid": pad(
            np.ones(len(rim_local), dtype=bool)
            if rim_local
            else np.zeros(1, dtype=bool),
            cap(nrim),
            False,
        ),
        "target_radius": np.asarray(float(radius or 0.0)),
        "has_radius": np.asarray(radius is not None),
    }


def compile_static(layout):
    """Hashable flag: does the rigid fit include the rim-radius pinning pass?

    The flag gates a structurally different program (double Kabsch fit with
    rim re-pinning), so it must be a trace-time constant — reading it from
    the traced extras raised TracerArrayConversionError whenever the
    enforcer was traced with an abstract topo.
    """
    gp = layout.mesh.global_parameters
    radius = gp.get("rigid_disk_radius")
    if radius is None:
        defs = getattr(layout.mesh, "definitions", {}) or {}
        disk_def = defs.get("disk") if isinstance(defs.get("disk"), dict) else None
        if disk_def:
            radius = disk_def.get("pin_to_circle_radius")
    return ("has_radius", radius is not None)


def _pair_slot_rows(state, topo):
    """Shared slot form of the pairwise-distance rows: each KKT row touches
    exactly the two pair vertices, gradient (+diff at i, -diff at j) with
    fully-fixed pairs skipped (reference rigid_disk.py:189-255)."""
    x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
    rows = x("rows")
    pairs = x("pairs")
    pvalid = x("pairs_valid")
    positions = state.positions
    ri = rows[pairs[:, 0]]
    rj = rows[pairs[:, 1]]
    fixed_i = topo.fixed_mask[ri]
    fixed_j = topo.fixed_mask[rj]
    use = pvalid & ~(fixed_i & fixed_j)
    diff = positions[ri] - positions[rj]
    gi = jnp.where((use & ~fixed_i)[:, None], diff, 0.0)
    gj = jnp.where((use & ~fixed_j)[:, None], -diff, 0.0)
    return gi, gj, ri, rj


def make_constraint_gradient_rows(spec):
    def fn(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return None
        positions = state.positions
        n_rows = positions.shape[0]
        gi, gj, ri, rj = _pair_slot_rows(state, topo)
        k = ri.shape[0]
        idx = jnp.arange(k)
        out = (
            jnp.zeros((k, n_rows, 3), positions.dtype)
            .at[idx, ri]
            .add(gi)
            .at[idx, rj]
            .add(gj)
        )
        return out

    return fn


def make_compact_constraint_rows(spec):
    """Compact-support form of the pairwise rows: (values (K, 2, 3), rows
    (K, 2)).  Each distance invariant touches exactly its two pair
    vertices, so the KKT projector assembles the normal equations from
    slots in O(K^2 s^2) instead of materializing (K, Nv, 3) dense rows —
    the dense form's K x 3Nv Gram matmul dominated the refined free-disk
    lane's per-step cost (~210 ms of a ~330 ms block step).  Values match
    make_constraint_gradient_rows exactly."""

    def fn(state, topo, params):
        if f"{_PREFIX}/rows" not in topo.extras:
            return None
        gi, gj, ri, rj = _pair_slot_rows(state, topo)
        slot_vals = jnp.stack([gi, gj], axis=1)  # (k, 2, 3)
        slot_rows = jnp.stack([ri, rj], axis=1)  # (k, 2)
        return slot_vals, slot_rows

    return fn


def make_enforce(spec):
    def enforce(state, topo, params, context="minimize"):
        if f"{_PREFIX}/rows" not in topo.extras:
            return state
        x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
        rows = x("rows")
        valid = x("valid")
        dtype = state.positions.dtype
        ref = jnp.asarray(x("ref"), dtype)
        w = valid.astype(dtype)[:, None]
        n_live = jnp.maximum(jnp.sum(w), 1.0)

        current = state.positions[rows]

        def wmean(a):
            return jnp.sum(a * w, axis=0) / n_live

        # masked Kabsch: weight padded rows to their centroids so they don't
        # contribute to the cross-covariance
        Pc = wmean(ref)
        Qc = wmean(current)
        P0 = (ref - Pc) * w
        Q0 = (current - Qc) * w
        H = P0.T @ Q0
        evals, V = dlinalg.eigh_3x3(H.T @ H)
        sig = jnp.sqrt(_fmax_tiny(evals))
        U = (H @ V) / sig[None, :]
        u2 = U[:, 2] / _fmax_tiny(jnp.linalg.norm(U[:, 2]))
        u1 = U[:, 1] - jnp.dot(U[:, 1], u2) * u2
        u1 = u1 / _fmax_tiny(jnp.linalg.norm(u1))
        u0 = jnp.cross(u1, u2)
        Um = jnp.stack([u0, u1, u2], axis=1)
        v2 = V[:, 2]
        v1 = V[:, 1] - jnp.dot(V[:, 1], v2) * v2
        v1 = v1 / _fmax_tiny(jnp.linalg.norm(v1))
        v0 = jnp.cross(v1, v2)
        Vm = jnp.stack([v0, v1, v2], axis=1)
        R = Vm @ Um.T
        R = jnp.where(
            jnp.linalg.det(R) < 0.0, Vm.at[:, 0].set(-Vm[:, 0]) @ Um.T, R
        )
        t = Qc - R @ Pc
        corrected = ref @ R.T + t

        _k, _v = spec.static_of(_PREFIX, ("has_radius", False))
        has_radius = bool(_v)
        if has_radius:
            rim_local = x("rim_local")
            rim_valid = x("rim_valid")
            target_r = jnp.asarray(x("target_radius"), dtype)
            ref_center = wmean(ref)
            rel = (ref - ref_center) * w
            normal_ref = dlinalg.smallest_eigvec_3x3(rel.T @ rel)
            center = R @ ref_center + t
            normal = R @ normal_ref
            normal = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-12)
            p = corrected[rim_local]
            v = p - center
            v_plane = v - jnp.sum(v * normal, axis=1, keepdims=True) * normal
            nrm = jnp.linalg.norm(v_plane, axis=1)
            ok = rim_valid & (nrm > 1e-12)
            pinned = center + target_r * v_plane / jnp.maximum(nrm, 1e-12)[:, None]
            # padded rim entries duplicate local row 0 — drop them out of bounds
            safe_rim = jnp.where(ok, rim_local, corrected.shape[0])
            corrected = corrected.at[safe_rim].set(pinned, mode="drop")
            # second fit onto the rim-pinned targets
            Qc2 = wmean(corrected)
            Q02 = (corrected - Qc2) * w
            H2 = P0.T @ Q02
            evals2, V2 = dlinalg.eigh_3x3(H2.T @ H2)
            sig2 = jnp.sqrt(_fmax_tiny(evals2))
            U2 = (H2 @ V2) / sig2[None, :]
            u2b = U2[:, 2] / _fmax_tiny(jnp.linalg.norm(U2[:, 2]))
            u1b = U2[:, 1] - jnp.dot(U2[:, 1], u2b) * u2b
            u1b = u1b / _fmax_tiny(jnp.linalg.norm(u1b))
            u0b = jnp.cross(u1b, u2b)
            Um2 = jnp.stack([u0b, u1b, u2b], axis=1)
            v2b = V2[:, 2]
            v1b = V2[:, 1] - jnp.dot(V2[:, 1], v2b) * v2b
            v1b = v1b / _fmax_tiny(jnp.linalg.norm(v1b))
            v0b = jnp.cross(v1b, v2b)
            Vm2 = jnp.stack([v0b, v1b, v2b], axis=1)
            R2 = Vm2 @ Um2.T
            R2 = jnp.where(
                jnp.linalg.det(R2) < 0.0, Vm2.at[:, 0].set(-Vm2[:, 0]) @ Um2.T, R2
            )
            t2 = Qc2 - R2 @ wmean(ref)
            corrected = ref @ R2.T + t2

        # padded entries duplicate row 0; route them out of bounds so the
        # scatter drops them instead of clobbering the live row-0 write
        n_rows = state.positions.shape[0]
        safe_rows = jnp.where(valid, rows, n_rows)
        new_positions = state.positions.at[safe_rows].set(corrected, mode="drop")
        return dataclasses.replace(state, positions=new_positions)

    return enforce
