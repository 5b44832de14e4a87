"""Soft rim matching energy (penalty form of the kinematic rim condition).

Parity: reference ``modules/energy/rim_slope_match_out.py``:

    E = 1/2 k sum_i w_i ((t_out . r_hat)_i - phi_i)^2
      + 1/2 k sum_i w_i ((t_in  . r_hat)_i - (theta_disk - phi_i))^2   (disk set)

with phi_i = (h_out - h_rim) * inv_dr about (center, normal), w_i rim
arc-length weights, theta_disk per-vertex when the disk ring pairs 1:1 with
the rim and the arc-length-weighted mean otherwise.  Small-slope shape
gradient: only the height dependence of phi is differentiated (radial
distances, weights, and directions frozen) — realized by computing heights
from live positions and everything else from stop-gradiented ones.  Exact
tilt gradients.  Shares ring topology and live matching payload with the hard
constraint module (constraints/rim_slope_match_out.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from membrane_solver_tpu.constraints import rim_slope_match_out as rim
from membrane_solver_tpu.utils.precision import fmax_tiny as _fmax_tiny

USES_TILT_LEAFLETS = True

_PREFIX = "energy:rim_slope_match_out"

compile_topology = rim.compile_topology
compile_static = rim.compile_static


def make_energy(spec):
    flags = rim._spec_flags_for(spec, key=_PREFIX)
    if flags is None:
        return lambda geo, state, topo, params: jnp.asarray(0.0)
    has_disk, interp_outer, local_disk, _theta_is_param = flags

    def fn(geo, state, topo, params):
        dtype = state.positions.dtype
        if f"{_PREFIX}/rim" not in topo.extras:
            return jnp.asarray(0.0, dtype)
        k_match = params.get("rim_slope_match_strength", jnp.asarray(0.0))

        frozen = jax.lax.stop_gradient(state.positions)
        valid, _phi_f, inv_dr, r_hat, weights, normal, omap = rim.matching_data(
            frozen, topo, params, interp_outer=interp_outer, prefix=_PREFIX
        )
        rim_rows = rim._x(topo, "rim", _PREFIX)
        outer_rows = rim._x(topo, "outer", _PREFIX)
        idx0, idx1, w0, w1 = omap
        nvec = jnp.asarray(normal, dtype)
        center = jnp.asarray(rim._x(topo, "center", _PREFIX), dtype)

        # live heights, frozen radial geometry (small-slope shape gradient)
        h_rim = jnp.sum((state.positions[rim_rows] - center) * nvec, axis=1)
        h_out = w0 * jnp.sum(
            (state.positions[outer_rows[idx0]] - center) * nvec, axis=1
        ) + w1 * jnp.sum((state.positions[outer_rows[idx1]] - center) * nvec, axis=1)
        phi = jnp.where(valid, (h_out - h_rim) * inv_dr, 0.0)

        diff_out = jnp.sum(state.tilts_out[rim_rows] * r_hat, axis=1) - phi
        E = 0.5 * k_match * jnp.sum(jnp.where(valid, weights * diff_out**2, 0.0))

        if has_disk:
            # the soft energy form always reads theta_disk from the disk-ring
            # tilts (energy/rim_slope_match_out.py:509-545) — it does NOT use
            # rim_slope_match_thetaB_param (that is a hard-constraint feature)
            disk, dgood, disk_r_hat, dw = rim._disk_geometry(
                frozen, topo, dtype, prefix=_PREFIX
            )
            theta_vals = jnp.sum(state.tilts_in[disk] * disk_r_hat, axis=1)
            if local_disk:
                theta_i = theta_vals
            else:
                wsum = jnp.sum(jnp.where(dgood, dw, 0.0))
                theta_i = jnp.full_like(
                    phi,
                    jnp.sum(jnp.where(dgood, dw * theta_vals, 0.0))
                    / _fmax_tiny(wsum),
                )
            diff_in = jnp.sum(state.tilts_in[rim_rows] * r_hat, axis=1) - (
                theta_i - phi
            )
            E = E + 0.5 * k_match * jnp.sum(
                jnp.where(valid, weights * diff_in**2, 0.0)
            )
        return E

    return fn


def energy(geo, state, topo, params):
    return jnp.asarray(0.0, state.positions.dtype)
