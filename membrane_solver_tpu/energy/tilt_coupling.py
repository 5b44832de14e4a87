"""Inter-leaflet tilt coupling: E = 1/2 k_c integral |t_out +/- t_in|^2 dA.

Parity: reference ``modules/energy/tilt_coupling.py``:

    E = sum_tri 0.5 * k_c * (|d_0|^2 + |d_1|^2 + |d_2|^2)/3 * A_tri
    d_i = t_out_i + sign * t_in_i       (corner tilts)

sign = -1 for ``tilt_coupling_mode: difference`` (tracking), +1 for ``sum``
(anti-tracking); the misspelled legacy alias ``tilt_couping_mode`` is accepted.
The reference contributes only tilt gradients (k_c * d * A_v barycentric, both
leaflets, same sign structure) — positions are treated as frozen, so the shape
block is stop-gradiented here.  Inactive (zero) when the mode is unset or
unrecognized, or when ``tilt_coupling_modulus`` is 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo

USES_TILT_LEAFLETS = True


def _resolve_sign(spec) -> float | None:
    mode = spec.option("tilt_coupling_mode", None) or spec.option(
        "tilt_couping_mode", None
    )
    if mode is None:
        return None
    mode = str(mode).strip().lower()
    if mode in ("difference", "diff", "minus", "sub"):
        return -1.0
    if mode in ("sum", "add", "plus"):
        return 1.0
    return None


def make_energy(spec):
    sign = _resolve_sign(spec)

    def fn(geo, state, topo, params):
        dtype = state.positions.dtype
        if sign is None:
            return jnp.asarray(0.0, dtype)
        k_c = params.get("tilt_coupling_modulus", jnp.asarray(0.0))
        # shape gradient = coeff * dA/dx with the tilt mismatch frozen
        # (tilt_coupling.py:66-69); tilt gradients exact
        live_geo = dgeo.triangle_geometry(state.positions, topo.tri_rows, topo.tri_valid)
        d = state.tilts_out[topo.tri_rows] + sign * state.tilts_in[topo.tri_rows]
        sq = jnp.sum(d * d, axis=(1, 2)) / 3.0  # mean corner |d|^2 * 3 / 3
        sq_frozen = jax.lax.stop_gradient(sq)
        area_term = jnp.sum(jnp.where(topo.tri_valid, sq_frozen * live_geo.area, 0.0))
        frozen_area = jax.lax.stop_gradient(live_geo.area)
        tilt_term = jnp.sum(jnp.where(topo.tri_valid, sq * frozen_area, 0.0))
        return 0.5 * k_c * (
            area_term + tilt_term - jax.lax.stop_gradient(tilt_term)
        )

    return fn


def energy(geo, state, topo, params):
    return jnp.asarray(0.0, state.positions.dtype)
