"""Inner-leaflet split splay/twist tilt-gradient energy (Kozlov-Hamm split).

Parity: reference ``modules/energy/tilt_splay_twist_in.py``:

    E = 1/2 sum_tri A * (k_splay * div_eval^2 + k_twist * (curl(t).n_hat)^2)

with per-triangle P1 operators:  div = sum t_i.g_i,  curl.n = sum (g_i x t_i).n_hat.

- ``tilt_splay_modulus_in`` falls back to ``bending_modulus_in`` then
  ``bending_modulus``; ``tilt_twist_modulus_in`` falls back to
  ``tilt_twist_modulus`` (default 0 — pure splay).
- ``tilt_divergence_mode_in`` (fallback ``tilt_divergence_mode``):
  "native" uses the raw triangle divergence; "vertex_recovered" replaces it
  with the mean of the area-weighted vertex-recovered divergences of the
  triangle's corners.
- ``tilt_transport_model`` "connection_v1" transports corner tilts into the
  triangle plane by minimal rotation before applying the operators
  (ambient_v1, the default, uses the raw corner tilts).

The reference computes only the exact tilt gradient (positions frozen), so the
shape block is stop-gradiented; jax.grad through this expression reproduces it
(including the transport-rotation pullback R^T d_local).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.device import tilt_ops

USES_TILT_LEAFLETS = True


def make_energy(spec):
    div_mode = (
        spec.option("tilt_divergence_mode_in", None)
        or spec.option("tilt_divergence_mode", "native")
    ).strip().lower()
    transport = spec.option("tilt_transport_model", "ambient_v1").strip().lower()

    def fn(geo, state, topo, params):
        dtype = state.positions.dtype
        zero = jnp.asarray(0.0)
        k_splay = params.get(
            "tilt_splay_modulus_in",
            params.get("bending_modulus_in", params.get("bending_modulus", zero)),
        )
        k_twist = params.get(
            "tilt_twist_modulus_in", params.get("tilt_twist_modulus", zero)
        )
        frozen = jax.lax.stop_gradient(state.positions)
        n_rows = frozen.shape[0]
        fgeo = dgeo.triangle_geometry(frozen, topo.tri_rows, topo.tri_valid)
        g = dgeo.p1_shape_gradients(fgeo)  # (F, corner, xyz)
        area = fgeo.area

        if transport == "connection_v1":
            vnorm = dgeo.vertex_normals(fgeo, topo.tri_rows, topo.tri_valid, n_rows)
            t0, t1, t2, _, _, _ = tilt_ops.transport_tilts_to_triangle_planes(
                frozen, state.tilts_in, vnorm, topo.tri_rows, topo.tri_valid
            )
        else:
            t0 = state.tilts_in[topo.tri_rows[:, 0]]
            t1 = state.tilts_in[topo.tri_rows[:, 1]]
            t2 = state.tilts_in[topo.tri_rows[:, 2]]

        div_tri = (
            jnp.sum(t0 * g[:, 0], axis=1)
            + jnp.sum(t1 * g[:, 1], axis=1)
            + jnp.sum(t2 * g[:, 2], axis=1)
        )
        div_tri = jnp.where(topo.tri_valid, div_tri, 0.0)

        if div_mode == "vertex_recovered":
            w = jnp.where(topo.tri_valid, area, 0.0)
            v_area = dgeo.scatter_add_rows(w, w, w, topo.tri_rows, n_rows)
            num = dgeo.scatter_add_rows(
                w * div_tri, w * div_tri, w * div_tri, topo.tri_rows, n_rows
            )
            v_div = jnp.where(v_area > 1e-20, num / jnp.maximum(v_area, 1e-20), 0.0)
            div_eval = (
                v_div[topo.tri_rows[:, 0]]
                + v_div[topo.tri_rows[:, 1]]
                + v_div[topo.tri_rows[:, 2]]
            ) / 3.0
        else:
            div_eval = div_tri

        n_hat = fgeo.unit_normal
        curl_vec = jnp.cross(g[:, 0], t0) + jnp.cross(g[:, 1], t1) + jnp.cross(g[:, 2], t2)
        curl_n = jnp.where(topo.tri_valid, jnp.sum(curl_vec * n_hat, axis=1), 0.0)

        density = k_splay * div_eval * div_eval + k_twist * curl_n * curl_n
        return jnp.asarray(
            0.5 * jnp.sum(jnp.where(topo.tri_valid, area * density, 0.0)), dtype
        )

    return fn


def energy(geo, state, topo, params):
    return make_energy(type("S", (), {"option": lambda self, k, d="": d})())(
        geo, state, topo, params
    )
