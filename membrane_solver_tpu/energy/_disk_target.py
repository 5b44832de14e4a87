"""Shared core for the soft disk tilt-profile targets (in / out leaflets).

Parity: reference ``modules/energy/tilt_disk_target_{in,out}.py``:

    E = 1/2 k integral |t - theta(r) r_hat|^2 dA       (diff zeroed off-disk)
    theta(r) = theta_B * I1(lam r) / I1(lam R)         (lam -> 0: theta_B r / R)

assembled per triangle as 0.5 k (sum_corner |diff|^2 / 3) A_tri.  lam comes
from ``tilt_disk_target_lambda{sfx}`` or sqrt(k_tilt / kappa) (including the
reference's misspelled ``tilt_modolus_in`` fallback); R is the explicit radius
or the max in-plane disk radius.  The reference's shape gradient treats the
target and diff as frozen and differentiates only the triangle areas, so here
diff is built from stop-gradiented positions while the areas stay live.
Target geometry (r_hat, theta) is resolved from live positions too (matching
the version-keyed recomputation host-side).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.device import linalg as dlinalg
from membrane_solver_tpu.utils.precision import fmax_tiny as _fmax_tiny


def _bessel_i1_series(x, n_terms: int = 30):
    t = 0.5 * x
    t2 = t * t
    term = t
    out = term
    for k in range(1, int(n_terms)):
        term = term * t2 / (k * (k + 1))
        out = out + term
    return out


def build_compile_topology(prefix: str, sfx: str):
    def compile_topology(layout) -> dict:
        mesh = layout.mesh
        gp = mesh.global_parameters

        def get(base):
            v = gp.get(f"{base}{sfx}")
            return gp.get(base) if v is None else v

        empty = {
            "rows": np.zeros(1, dtype=np.int32),
            "valid": np.zeros(1, dtype=bool),
            "center": np.zeros(3),
            "normal": np.array([0.0, 0.0, 1.0]),
            "has_normal": np.asarray(False),
            "radius": np.asarray(0.0),
            "has_radius": np.asarray(False),
            "lam": np.asarray(0.0),
            "theta_b": np.asarray(0.0),
        }
        raw_group = gp.get(f"tilt_disk_target_group{sfx}")
        if raw_group is None or not str(raw_group).strip():
            return empty
        group = str(raw_group).strip()
        # vertices tagged with the per-leaflet option key (tilt_disk_target_in
        # _collect_group_rows: only the suffixed option is consulted)
        rows = [
            layout.row_of[int(vid)]
            for vid in sorted(mesh.vertices)
            if (mesh.vertices[vid].options or {}).get(f"tilt_disk_target_group{sfx}")
            == group
        ]
        if not rows:
            return empty

        center = np.asarray(get("tilt_disk_target_center") or [0, 0, 0], dtype=float)
        raw_n = get("tilt_disk_target_normal")
        if raw_n is not None:
            normal = np.asarray(raw_n, dtype=float).reshape(3)
            normal /= max(np.linalg.norm(normal), 1e-15)
            has_normal = True
        else:
            normal = np.array([0.0, 0.0, 1.0])
            has_normal = False
        radius = get("tilt_disk_target_radius")
        lam = get("tilt_disk_target_lambda")
        if lam is None:
            k_tilt = gp.get(f"tilt_modulus{sfx}")
            if k_tilt is None:
                k_tilt = gp.get(f"tilt_modolus{sfx}")  # reference's typo fallback
            kappa = gp.get(f"bending_modulus{sfx}") or gp.get("bending_modulus")
            try:
                lam = (
                    float(np.sqrt(float(k_tilt) / float(kappa)))
                    if k_tilt and kappa and float(k_tilt) > 0 and float(kappa) > 0
                    else 0.0
                )
            except (TypeError, ValueError):
                lam = 0.0
        theta_b = get("tilt_disk_target_theta_B") or 0.0

        n = len(rows)
        nc = 1
        while nc < n:
            nc *= 2
        pad = layout.pad_rows
        return {
            "rows": pad(np.asarray(rows, dtype=np.int32), nc, 0),
            "valid": pad(np.ones(n, dtype=bool), nc, False),
            "center": center,
            "normal": normal,
            "has_normal": np.asarray(has_normal),
            "radius": np.asarray(float(radius or 0.0)),
            "has_radius": np.asarray(radius is not None),
            "lam": np.asarray(float(lam or 0.0)),
            "theta_b": np.asarray(float(theta_b)),
        }

    return compile_topology


def build_compile_static(prefix: str, sfx: str):
    """Hashable per-compile flags: (has_normal,).

    Mirrors build_compile_topology's normal resolution so jitted energy
    fns can branch on it in Python (the extras copy is a tracer under jit).
    """

    def compile_static(layout):
        gp = layout.mesh.global_parameters

        def get(base):
            v = gp.get(f"{base}{sfx}")
            return gp.get(base) if v is None else v

        return (get("tilt_disk_target_normal") is not None,)

    return compile_static


def disk_target_energy(
    state, topo, params, *, prefix: str, sfx: str, field: str, has_normal=None
):
    dtype = state.positions.dtype
    key = f"energy:{prefix}/rows"
    if key not in topo.extras:
        return jnp.asarray(0.0, dtype)
    x = lambda k: topo.extras[f"energy:{prefix}/{k}"]  # noqa: E731
    rows = x("rows")
    valid = x("valid")
    k_target = params.get(f"tilt_disk_target_strength{sfx}", jnp.asarray(0.0))
    theta_b = jnp.asarray(x("theta_b"), dtype)

    frozen = jax.lax.stop_gradient(state.positions)
    n_rows = frozen.shape[0]
    center = jnp.asarray(x("center"), dtype)
    # has_normal is a compile-time constant: under jit the extras value is a
    # tracer and bool(tracer) raises, so make_energy threads it in from the
    # spec statics (build_compile_static); direct unjitted callers may omit
    # it and fall back to the concrete extras read.
    if has_normal is None:
        has_normal = bool(x("has_normal"))
    if has_normal:
        normal = jnp.asarray(x("normal"), dtype)
    else:
        pts = frozen[rows]
        w = valid.astype(dtype)[:, None]
        centroid = jnp.sum(pts * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        rel = (pts - centroid) * w
        normal = dlinalg.smallest_eigvec_3x3(rel.T @ rel)

    pts = frozen[rows]
    r_vec = pts - center
    r_vec = r_vec - jnp.sum(r_vec * normal, axis=1, keepdims=True) * normal
    r_len = jnp.linalg.norm(r_vec, axis=1)
    good = valid & (r_len > 1e-12)
    r_hat = jnp.where(good[:, None], r_vec / jnp.maximum(r_len, 1e-12)[:, None], 0.0)

    radius = jnp.where(
        jnp.asarray(x("has_radius")),
        jnp.asarray(x("radius"), dtype),
        jnp.max(jnp.where(good, r_len, 0.0)),
    )
    lam = jnp.asarray(x("lam"), dtype)
    theta_linear = theta_b * r_len / _fmax_tiny(radius)
    den = _bessel_i1_series(lam * radius)
    theta_bessel = theta_b * _bessel_i1_series(lam * r_len) / jnp.where(
        jnp.abs(den) < 1e-15, 1.0, den
    )
    theta = jnp.where(jnp.abs(lam) < 1e-12, theta_linear, theta_bessel)
    theta = jnp.where(jnp.abs(den) < 1e-15, 0.0, theta)

    # drop padding entries instead of scattering them to row 0 (the rows
    # table pads with 0): a plain .set would let a later padding entry
    # clear row 0's target/flag whenever vertex row 0 is on the disk
    safe_rows = jnp.where(valid, rows, n_rows)
    target = jnp.zeros((n_rows, 3), dtype).at[safe_rows].set(
        jnp.where(good[:, None], theta[:, None] * r_hat, 0.0), mode="drop"
    )
    on_disk = jnp.zeros((n_rows,), bool).at[safe_rows].set(valid, mode="drop")
    tilts = getattr(state, field)
    diff = jnp.where(on_disk[:, None], tilts - target, 0.0)
    diff_sq = jnp.sum(diff * diff, axis=1)

    geo = dgeo.triangle_geometry(state.positions, topo.tri_rows, topo.tri_valid)
    tri_sum = jnp.sum(diff_sq[topo.tri_rows], axis=1)
    coeff = 0.5 * k_target * tri_sum / 3.0
    return jnp.sum(jnp.where(topo.tri_valid, coeff * geo.area, 0.0))
