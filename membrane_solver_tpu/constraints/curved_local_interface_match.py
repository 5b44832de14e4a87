"""Tilt-only local interface vector matching for curved free-z disk boundaries.

Parity: reference ``modules/constraints/curved_local_interface_match.py``:

- pairs each rim-shell row with a disk-boundary row (azimuth-matched; the
  ``local_mixed_match_v1`` mode pairs rim_rows_matched against disk rows);
- KKT tilt rows: for each tangent-basis direction (u and v; only v in mixed
  mode) ONE aggregated equality row +basis at every rim row, -basis at every
  disk row, duplicated for both leaflets (lines 127-168);
- ``enforce_tilt_constraint``: per pair, project both leaflet tilts in the
  pair-averaged tangent basis — "vector_average" averages the (u, v)
  coefficients (or keeps the fixed side / the mode-designated side), while
  "local_mixed_match_v1" averages only the tangential (v) coefficient and
  sets the radial (u) coefficient to +-phi (out/in) (lines 206-369).

Pair normals, bases, and phi are live on device; pair row selection is
compile-time (see local_interface_shells.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.constraints.local_interface_shells import (
    build_shell_rows,
    pack_pairs,
)
from membrane_solver_tpu.device import geo as dgeo

_PREFIX = "constraint:curved_local_interface_match"

_MODES = {
    "vector_average": "vector_average",
    "average": "vector_average",
    "local_mixed_match_v1": "local_mixed_match_v1",
    "mixed": "local_mixed_match_v1",
    "rim_to_disk": "rim_to_disk",
    "rim2disk": "rim_to_disk",
    "disk_to_rim": "disk_to_rim",
    "disk2rim": "disk_to_rim",
}


def _mode(gp) -> str:
    raw = gp.get("curved_local_interface_match_mode")
    return _MODES.get(str(raw or "vector_average").strip().lower(), "vector_average")


def compile_static(layout):
    return (_mode(layout.mesh.global_parameters),)


def compile_topology(layout) -> dict:
    shells = build_shell_rows(layout)
    if shells is None:
        empty = pack_pairs(layout, np.zeros(0, dtype=int), np.zeros(0, dtype=int))
        return {
            "pair_rows_a": empty["rows_a"],
            "pair_rows_b": empty["rows_b"],
            "pair_valid": empty["valid"],
            "slope_rows_a": empty["rows_a"],
            "slope_rows_b": empty["rows_b"],
            "slope_valid": empty["valid"],
        }
    mode = _mode(layout.mesh.global_parameters)
    if mode == "local_mixed_match_v1":
        # rim_rows_matched paired with nearest-azimuth disk rows
        n = len(layout.vertex_ids)
        mesh = layout.mesh
        positions = np.array(
            [mesh.vertices[int(layout.vertex_ids[r])].position for r in range(n)]
        )
        rim = shells.rim_rows_matched
        phi_rim = np.mod(np.arctan2(positions[rim, 1], positions[rim, 0]), 2 * np.pi)
        phi_disk = np.mod(
            np.arctan2(positions[shells.disk_rows, 1], positions[shells.disk_rows, 0]),
            2 * np.pi,
        )
        d = np.abs(phi_rim[:, None] - phi_disk[None, :])
        d = np.minimum(d, 2 * np.pi - d)
        disk = shells.disk_rows[np.argmin(d, axis=1)]
    else:
        rim = shells.rim_rows
        disk = shells.disk_rows_matched
    pairs = pack_pairs(layout, rim, disk)
    slope = pack_pairs(layout, shells.rim_rows_matched, shells.outer_rows)
    return {
        "pair_rows_a": pairs["rows_a"],  # rim rows
        "pair_rows_b": pairs["rows_b"],  # disk rows
        "pair_valid": pairs["valid"],
        "slope_rows_a": slope["rows_a"],
        "slope_rows_b": slope["rows_b"],
        "slope_valid": slope["valid"],
    }


def _bases(positions, topo):
    """Live pair tangent bases (u radial-preferred, v = n x u) and phi."""
    x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
    rim = x("pair_rows_a")
    disk = x("pair_rows_b")
    valid = x("pair_valid")
    dtype = positions.dtype
    n_rows = positions.shape[0]
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    normals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
    pair_n = normals[disk] + normals[rim]
    pn = jnp.linalg.norm(pair_n, axis=1)
    pair_n = jnp.where((pn < 1e-12)[:, None], normals[rim], pair_n)
    pn = jnp.linalg.norm(pair_n, axis=1)
    pair_n = pair_n / jnp.maximum(pn, 1e-12)[:, None]

    r_rim = jnp.linalg.norm(positions[rim, :2], axis=1)
    r_hat = jnp.zeros((rim.shape[0], 3), dtype)
    good_r = r_rim > 1e-12
    r_hat = r_hat.at[:, 0].set(
        jnp.where(good_r, positions[rim, 0] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    r_hat = r_hat.at[:, 1].set(
        jnp.where(good_r, positions[rim, 1] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    u = r_hat - jnp.sum(r_hat * pair_n, axis=1, keepdims=True) * pair_n
    un = jnp.linalg.norm(u, axis=1)
    trial = jnp.where(
        (jnp.abs(pair_n[:, 0]) > 0.9)[:, None],
        jnp.asarray([0.0, 1.0, 0.0], dtype),
        jnp.asarray([1.0, 0.0, 0.0], dtype),
    )
    fallback = trial - jnp.sum(trial * pair_n, axis=1, keepdims=True) * pair_n
    fn = jnp.linalg.norm(fallback, axis=1)
    fallback = fallback / jnp.maximum(fn, 1e-12)[:, None]
    u = jnp.where((un < 1e-12)[:, None], fallback, u / jnp.maximum(un, 1e-12)[:, None])
    v = jnp.cross(pair_n, u)
    vn = jnp.linalg.norm(v, axis=1)
    v = jnp.where(
        (vn < 1e-12)[:, None],
        jnp.asarray([0.0, 1.0, 0.0], dtype),
        v / jnp.maximum(vn, 1e-12)[:, None],
    )

    # local slope phi from the rim_matched/outer shells (match.py:103-109)
    s_rim = x("slope_rows_a")
    s_out = x("slope_rows_b")
    dr = jnp.maximum(
        jnp.linalg.norm(positions[s_out, :2], axis=1)
        - jnp.linalg.norm(positions[s_rim, :2], axis=1),
        1e-6,
    )
    phi = (positions[s_out, 2] - positions[s_rim, 2]) / dr
    return rim, disk, valid, u, v, phi


def make_tilt_constraint_rows(spec):
    mode = spec.static_of(_PREFIX, ("vector_average",))[0]

    def fn(state, topo, params):
        if f"{_PREFIX}/pair_rows_a" not in topo.extras:
            return None
        positions = state.positions
        rim, disk, valid, u, v, _phi = _bases(positions, topo)
        n_rows = positions.shape[0]
        dtype = positions.dtype
        bases = (v,) if mode == "local_mixed_match_v1" else (u, v)
        rows = []
        zeros = jnp.zeros((n_rows, 3), dtype)
        for basis in bases:
            g = (
                jnp.zeros((n_rows, 3), dtype)
                .at[rim]
                .add(jnp.where(valid[:, None], basis, 0.0))
                .at[disk]
                .add(jnp.where(valid[:, None], -basis, 0.0))
            )
            rows.append(jnp.stack([g, zeros], axis=0))  # in-leaflet row
            rows.append(jnp.stack([zeros, g], axis=0))  # out-leaflet row
        return jnp.stack(rows, axis=0)

    return fn


def make_enforce_tilts(spec):
    mode = spec.static_of(_PREFIX, ("vector_average",))[0]

    def enforce(state, topo, params):
        if f"{_PREFIX}/pair_rows_a" not in topo.extras:
            return state
        positions = state.positions
        rim, disk, valid, u, v, phi = _bases(positions, topo)

        def project(tilts, fixed_mask, radial_sign):
            d_fix = fixed_mask[disk]
            r_fix = fixed_mask[rim]
            cd_u = jnp.sum(tilts[disk] * u, axis=1)
            cd_v = jnp.sum(tilts[disk] * v, axis=1)
            cr_u = jnp.sum(tilts[rim] * u, axis=1)
            cr_v = jnp.sum(tilts[rim] * v, axis=1)
            if mode == "local_mixed_match_v1":
                tgt_v = 0.5 * (cd_v + cr_v)
                tgt_v = jnp.where(d_fix, cd_v, tgt_v)
                tgt_v = jnp.where(r_fix, cr_v, tgt_v)
                tgt_u_d = radial_sign * phi
                tgt_u_r = radial_sign * phi
            else:
                if mode == "disk_to_rim":
                    tgt_u, tgt_v = cd_u, cd_v
                elif mode == "rim_to_disk":
                    tgt_u, tgt_v = cr_u, cr_v
                else:
                    tgt_u = 0.5 * (cd_u + cr_u)
                    tgt_v = 0.5 * (cd_v + cr_v)
                tgt_u = jnp.where(d_fix, cd_u, tgt_u)
                tgt_v = jnp.where(d_fix, cd_v, tgt_v)
                tgt_u = jnp.where(r_fix, cr_u, tgt_u)
                tgt_v = jnp.where(r_fix, cr_v, tgt_v)
                tgt_u_d = tgt_u
                tgt_u_r = tgt_u
            ok_d = valid & ~d_fix
            ok_r = valid & ~r_fix
            delta_d = jnp.where(
                ok_d[:, None],
                (tgt_u_d - cd_u)[:, None] * u + (tgt_v - cd_v)[:, None] * v,
                0.0,
            )
            delta_r = jnp.where(
                ok_r[:, None],
                (tgt_u_r - cr_u)[:, None] * u + (tgt_v - cr_v)[:, None] * v,
                0.0,
            )
            return tilts.at[disk].add(delta_d).at[rim].add(delta_r)

        tilts_in = project(state.tilts_in, topo.tilt_fixed_in_mask, -1.0)
        tilts_out = project(state.tilts_out, topo.tilt_fixed_out_mask, 1.0)
        return dataclasses.replace(state, tilts_in=tilts_in, tilts_out=tilts_out)

    return enforce
