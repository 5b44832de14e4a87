"""Shared core for the caveolin rim source work terms (in / out / bilayer).

Parity: reference ``modules/energy/tilt_rim_source_{in,out,bilayer}.py``:

    E = - sum_edges gamma_e * L_e * (t_avg_e . r_hat_e)

over rim edges whose endpoints carry ``pin_to_circle_group == group``
("boundary" mode keeps only edges with < 2 incident facets; "all" keeps every
tagged edge).  t_avg is the edge-midpoint average of the module's tilt field
(t_in, t_out, or t_in + t_out for the bilayer term); r_hat is the in-plane
radial direction of the edge midpoint about the rim circle frame.  The frame
is the fixed (center param, option/plane normal) pair, or — when the rim's
``pin_to_circle_mode`` is ``fit`` — the followed frame: live centroid of the
rim rows and the option normal or live fitted plane normal
(tilt_rim_source_in.py:275-339).  Work term: tilt gradients only; positions
are stop-gradiented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import linalg as dlinalg
from membrane_solver_tpu.energy.contact_mapping import resolve_contact_line_strength


def _tag_group(options) -> str | None:
    if not options:
        return None
    group = options.get("pin_to_circle_group")
    return "default" if group is None else str(group)


def build_compile_topology(prefix: str, group_key: str, strength_key: str, suffix: str):
    """Return a compile_topology hook for one rim-source module."""

    def compile_topology(layout) -> dict:
        mesh = layout.mesh
        gp = mesh.global_parameters
        empty = {
            "tails": np.zeros(1, dtype=np.int32),
            "heads": np.zeros(1, dtype=np.int32),
            "valid": np.zeros(1, dtype=bool),
            "gamma": np.zeros(1),
            "rim_rows": np.zeros(1, dtype=np.int32),
            "rim_valid": np.zeros(1, dtype=bool),
            "follow": np.asarray(False),
            "center": np.zeros(3),
            "normal": np.array([0.0, 0.0, 1.0]),
            "has_normal": np.asarray(False),
        }
        raw_group = gp.get(group_key)
        if raw_group is None or not str(raw_group).strip():
            return empty
        group = str(raw_group).strip()
        mode = str(gp.get("tilt_rim_source_edge_mode") or "boundary").strip().lower()

        # edge selection (tilt_rim_source_in.py:57-100)
        edges = []
        for eid, edge in mesh.edges.items():
            v0 = mesh.vertices[edge.tail_index]
            v1 = mesh.vertices[edge.head_index]
            if _tag_group(v0.options) != group or _tag_group(v1.options) != group:
                continue
            if mode != "all" and len(mesh.facets_of_edge(int(eid))) >= 2:
                continue
            edges.append(edge)
        if not edges:
            return empty

        tails = [layout.row_of[e.tail_index] for e in edges]
        heads = [layout.row_of[e.head_index] for e in edges]
        gamma = [
            resolve_contact_line_strength(
                gp,
                getattr(e, "options", None),
                strength_key=strength_key,
                contact_suffix=suffix,
            ).gamma
            for e in edges
        ]

        rim_rows = sorted(
            {layout.row_of[int(vid)] for vid, v in mesh.vertices.items()
             if _tag_group(v.options) == group}
        )
        first = mesh.vertices[int(layout.vertex_ids[rim_rows[0]])]
        follow = (
            str((first.options or {}).get("pin_to_circle_mode") or "fixed").lower()
            == "fit"
        )
        raw_normal = (first.options or {}).get("pin_to_circle_normal")
        if raw_normal is not None:
            normal = np.asarray(raw_normal, dtype=float).reshape(3)
            normal /= max(np.linalg.norm(normal), 1e-15)
            has_normal = True
        else:
            normal = np.array([0.0, 0.0, 1.0])
            has_normal = False
        center = np.asarray(
            gp.get("tilt_rim_source_center") or [0.0, 0.0, 0.0], dtype=float
        )

        def cap(n):
            c = 1
            while c < n:
                c *= 2
            return c

        ne = len(edges)
        nr = len(rim_rows)
        pad = layout.pad_rows
        return {
            "tails": pad(np.asarray(tails, dtype=np.int32), cap(ne), 0),
            "heads": pad(np.asarray(heads, dtype=np.int32), cap(ne), 0),
            "valid": pad(np.ones(ne, dtype=bool), cap(ne), False),
            "gamma": pad(np.asarray(gamma, dtype=float), cap(ne), 0.0),
            "rim_rows": pad(np.asarray(rim_rows, dtype=np.int32), cap(nr), 0),
            "rim_valid": pad(np.ones(nr, dtype=bool), cap(nr), False),
            "follow": np.asarray(follow),
            "center": center,
            "normal": normal,
            "has_normal": np.asarray(has_normal),
        }

    return compile_topology


def rim_source_energy(state, topo, params, *, prefix: str, strength_key: str, fields):
    """E = -sum gamma L (t_avg . r_hat); fields selects the tilt arrays summed."""
    dtype = state.positions.dtype
    key = f"energy:{prefix}/tails"
    if key not in topo.extras:
        return jnp.asarray(0.0, dtype)
    x = lambda k: topo.extras[f"energy:{prefix}/{k}"]  # noqa: E731
    valid = x("valid")
    tails = x("tails")
    heads = x("heads")
    gamma_static = jnp.asarray(x("gamma"), dtype)
    gamma = params.get(strength_key, None)
    gamma_e = jnp.where(valid, gamma_static if gamma is None else gamma, 0.0)

    positions = jax.lax.stop_gradient(state.positions)
    p0 = positions[tails]
    p1 = positions[heads]
    mid = 0.5 * (p0 + p1)
    lengths = jnp.linalg.norm(p1 - p0, axis=1)

    rim_rows = x("rim_rows")
    rim_valid = x("rim_valid")
    # ``follow`` (pin_to_circle_mode == fit: track the live rim frame) is a
    # device scalar in the compiled extras; select with where so the energy
    # traces under jit regardless of the lane (positions are
    # stop_gradient'ed above, so the untaken branch cannot leak NaNs into
    # gradients)
    follow = x("follow")
    has_normal = x("has_normal")
    pts = positions[rim_rows]
    w = rim_valid.astype(dtype)[:, None]
    centroid = jnp.sum(pts * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    rel = (pts - centroid) * w
    fit_normal = dlinalg.smallest_eigvec_3x3(rel.T @ rel)
    static_center = jnp.asarray(x("center"), dtype)
    static_normal = jnp.asarray(x("normal"), dtype)
    center = jnp.where(follow, centroid, static_center)
    normal = jnp.where(follow & ~has_normal, fit_normal, static_normal)

    r = mid - center
    r = r - jnp.sum(r * normal, axis=1, keepdims=True) * normal
    rn = jnp.linalg.norm(r, axis=1)
    good = valid & (rn > 1e-12)
    r_hat = jnp.where(good[:, None], r / jnp.maximum(rn, 1e-12)[:, None], 0.0)

    t_avg = jnp.zeros_like(mid)
    for field in fields:
        arr = getattr(state, field)
        t_avg = t_avg + 0.5 * (arr[tails] + arr[heads])
    dots = jnp.sum(t_avg * r_hat, axis=1)
    return -jnp.sum(jnp.where(good, gamma_e * lengths * dots, 0.0))
