"""Shared device math for the curved local-interface energies.

Parity: reference ``modules/energy/curved_local_interface_{law,penalty}.py``:

    E = 1/2 s sum_valid ((t_out . r_hat)_rim - phi)^2
    phi = (z_outer - z_rim) / (r_outer - r_rim)      (cylindrical radii)

over azimuth-matched (rim_rows_matched[j], outer_rows[j]) pairs of the local
shell family.  The "law" differentiates the z dependence of phi (z-only shape
gradients, radii/r_hat frozen); the "penalty" contributes tilt gradients only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.constraints.local_interface_shells import (
    build_shell_rows,
    pack_pairs,
)


def compile_topology_pairs(layout) -> dict:
    shells = build_shell_rows(layout)
    if shells is None:
        return pack_pairs(layout, np.zeros(0, dtype=int), np.zeros(0, dtype=int))
    return pack_pairs(layout, shells.rim_rows_matched, shells.outer_rows)


def interface_mismatch(positions, topo, prefix, *, live_z: bool):
    """(valid, diff-ready pieces): rim rows, r_hat, phi with chosen z liveness."""
    x = lambda k: topo.extras[f"energy:{prefix}/{k}"]  # noqa: E731
    rim_rows = x("rows_a")
    outer_rows = x("rows_b")
    valid = x("valid")
    frozen = jax.lax.stop_gradient(positions)
    zpos = positions if live_z else frozen

    r_rim = jnp.linalg.norm(frozen[rim_rows, :2], axis=1)
    r_out = jnp.linalg.norm(frozen[outer_rows, :2], axis=1)
    dr = r_out - r_rim
    ok = valid & (jnp.abs(dr) > 1e-12)
    inv_dr = jnp.where(ok, 1.0 / jnp.where(ok, dr, 1.0), 0.0)
    phi = jnp.where(ok, (zpos[outer_rows, 2] - zpos[rim_rows, 2]) * inv_dr, 0.0)

    good_r = r_rim > 1e-12
    r_hat = jnp.zeros_like(frozen[rim_rows])
    r_hat = r_hat.at[:, 0].set(
        jnp.where(good_r, frozen[rim_rows, 0] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    r_hat = r_hat.at[:, 1].set(
        jnp.where(good_r, frozen[rim_rows, 1] / jnp.maximum(r_rim, 1e-12), 0.0)
    )
    return rim_rows, r_hat, phi, ok


def interface_energy(state, topo, params, *, prefix: str, strength_key: str, live_z: bool):
    dtype = state.positions.dtype
    if f"energy:{prefix}/rows_a" not in topo.extras:
        return jnp.asarray(0.0, dtype)
    s = params.get(strength_key, jnp.asarray(0.0))
    rim_rows, r_hat, phi, ok = interface_mismatch(
        state.positions, topo, prefix, live_z=live_z
    )
    diff = jnp.where(ok, jnp.sum(state.tilts_out[rim_rows] * r_hat, axis=1) - phi, 0.0)
    return 0.5 * s * jnp.sum(diff * diff)
