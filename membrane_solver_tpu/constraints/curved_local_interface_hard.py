"""Ring-averaged hard constraint on the local shell family near r=R.

Parity: reference ``modules/constraints/curved_local_interface_hard.py``:

- one KKT tilt row (outer leaflet only): r_dir / n_valid at each matched rim
  row, where r_dir is the rim radial direction tangent-projected against the
  live vertex normal (lines 56-76);
- ``enforce_tilt_constraint``: subtract the MEAN residual
  mean(t_out . r_dir - phi) along r_dir from every participating rim row
  (lines 105-141); phi = (z_outer - z_rim) / (r_outer - r_rim).

Shell rows are resolved at compile time (see local_interface_shells.py).
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

_PREFIX = "constraint:curved_local_interface_hard"


def compile_topology(layout) -> dict:
    shells = build_shell_rows(layout)
    if shells is None:
        return pack_pairs(layout, np.zeros(0, dtype=int), np.zeros(0, dtype=int))
    return pack_pairs(layout, shells.rim_rows_matched, shells.outer_rows)


def _matching(positions, topo):
    x = lambda k: topo.extras[f"{_PREFIX}/{k}"]  # noqa: E731
    rim_rows = x("rows_a")
    outer_rows = x("rows_b")
    valid = x("valid")
    n_rows = positions.shape[0]
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    normals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)

    r_rim = jnp.linalg.norm(positions[rim_rows, :2], axis=1)
    good_r = r_rim > 1e-12
    r_hat = jnp.zeros((rim_rows.shape[0], 3), positions.dtype)
    r_hat = r_hat.at[:, 0].set(
        jnp.where(good_r, positions[rim_rows, 0] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    r_hat = r_hat.at[:, 1].set(
        jnp.where(good_r, positions[rim_rows, 1] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    n_rim = normals[rim_rows]
    r_dir = r_hat - jnp.sum(r_hat * n_rim, axis=1, keepdims=True) * n_rim
    rnorm = jnp.linalg.norm(r_dir, axis=1)
    ok = valid & (rnorm > 1e-12)
    r_dir = jnp.where(ok[:, None], r_dir / jnp.maximum(rnorm, 1e-12)[:, None], 0.0)

    r_out = jnp.linalg.norm(positions[outer_rows, :2], axis=1)
    dr = r_out - r_rim
    ok = ok & (jnp.abs(dr) > 1e-12)
    phi = jnp.where(
        ok,
        (positions[outer_rows, 2] - positions[rim_rows, 2])
        / jnp.where(ok, dr, 1.0),
        0.0,
    )
    return rim_rows, r_dir, phi, ok


def make_tilt_constraint_rows(spec):
    def fn(state, topo, params):
        if f"{_PREFIX}/rows_a" not in topo.extras:
            return None
        positions = state.positions
        rim_rows, r_dir, _phi, ok = _matching(positions, topo)
        n_rows = positions.shape[0]
        dtype = positions.dtype
        n_valid = jnp.maximum(jnp.sum(ok.astype(dtype)), 1.0)
        gout = jnp.zeros((n_rows, 3), dtype).at[rim_rows].add(
            jnp.where(ok[:, None], r_dir / n_valid, 0.0)
        )
        zeros = jnp.zeros((n_rows, 3), dtype)
        return jnp.stack([zeros, gout], axis=0)[None]  # (1, 2=in/out, Nv, 3)

    return fn


def make_enforce_tilts(spec):
    def enforce(state, topo, params):
        if f"{_PREFIX}/rows_a" not in topo.extras:
            return state
        positions = state.positions
        rim_rows, r_dir, phi, ok = _matching(positions, topo)
        ok = ok & ~topo.tilt_fixed_out_mask[rim_rows]
        t_out = state.tilts_out
        residual = jnp.where(ok, jnp.sum(t_out[rim_rows] * r_dir, axis=1) - phi, 0.0)
        n_valid = jnp.maximum(jnp.sum(ok.astype(positions.dtype)), 1.0)
        mean_res = jnp.sum(residual) / n_valid
        delta = jnp.where(ok[:, None], -mean_res * r_dir, 0.0)
        return dataclasses.replace(state, tilts_out=t_out.at[rim_rows].add(delta))

    return enforce
