"""Fused per-triangle Pallas kernels (component-major lanes layout).

Each kernel consumes pre-gathered corner arrays and produces per-triangle
(or per-corner) results; the caller scatters them back to vertices.  All
math matches device/geo.py bit-for-bit at f32 (same operation order), so
the parity tests can compare directly.

Kernel layout: inputs are stacked component-major ``(C, T_pad)`` so the
triangle axis occupies the 128-wide lane dimension and every operation is
a pure VPU elementwise op; ``T_pad`` is a multiple of the 128-lane tile.

Parity targets:
- ``surface_corner_grads_pallas`` — reference fortran_kernels/surface_energy.f90:27-99
  (E += gamma * 0.5 |e1 x e2|, corner grads 0.5 (v_j - v_k) x n_hat);
- ``curvature_corners_pallas``   — reference fortran_kernels/tilt_kernels.f90:88-190
  (cotan weights, integrated mean-curvature corner vectors, Meyer
  mixed-Voronoi corner areas with obtuse branches);
- ``p1_divergence_pallas``       — reference fortran_kernels/tilt_kernels.f90:26-86
  (P1 shape gradients g_i = (n x e_i) / |n|^2, div = sum t_i . g_i).

Production status (measured, benchmarks/TRI_KERNELS_NULL_RESULT.md): the
shape-step pipelines stay stock XLA — on the real TPU the Pallas variants
are identical to XLA within tunnel noise at every production shape (the
pipelines are bound by the shared gather/scatter, which XLA already fuses
the per-triangle math into).  These kernels are retained as parity-tested
references (the NumPy-vs-Fortran analog) and as the tiling/layout
infrastructure for ``frozen_tilt.py``, which IS wired into the tilt inner
loop where a six-term fusion over one corner gather does win.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS_AREA = 1e-12  # matches device/geo.py degenerate-triangle clamp
LANES = 128
_TILE_T = 512  # triangles per grid step (4 lane-tiles)


def pallas_enabled(dtype=None) -> bool:
    """Pallas path: default ON on TPU, f32-only (f64 stays on stock XLA).

    MEMBRANE_SOLVER_PALLAS=0 disables; =1 forces (interpreter mode off-TPU,
    used by the parity tests).
    """
    env = os.environ.get("MEMBRANE_SOLVER_PALLAS")
    if env is not None:
        if env in {"0", "false", "no"}:
            return False
        enabled = True
    else:
        enabled = jax.default_backend() == "tpu"
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    return enabled


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_T(x: jnp.ndarray, t_pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1])))


def _stack_cm(*arrs):
    """Stack (T,3) arrays component-major into one (3*len, T) block."""
    return jnp.concatenate([a.T for a in arrs], axis=0)


# ----------------------------------------------------------------------
# surface energy + corner gradients
# ----------------------------------------------------------------------
def _surface_kernel(p_ref, gamma_ref, out_ref):
    p = p_ref[:]  # (9, TILE): v0 xyz, v1 xyz, v2 xyz
    v0, v1, v2 = p[0:3], p[3:6], p[6:9]
    e1 = v1 - v0
    e2 = v2 - v0

    def cross(a, b):
        return jnp.stack(
            [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ]
        )

    n = cross(e1, e2)
    dbl_sq = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    dbl = jnp.sqrt(dbl_sq)
    ok = dbl >= EPS_AREA
    n_hat = jnp.where(ok[None, :], n / jnp.maximum(dbl, EPS_AREA)[None, :], 0.0)
    gamma = gamma_ref[:]  # (1, TILE)
    area = jnp.where(ok, 0.5 * dbl, 0.0)[None, :]
    # corner gradients of gamma * area:  dA/dv0 = 0.5 (v2 - v1) x n_hat, cyclic
    g0 = 0.5 * cross(v2 - v1, n_hat) * gamma
    g1 = 0.5 * cross(v0 - v2, n_hat) * gamma
    g2 = 0.5 * cross(v1 - v0, n_hat) * gamma
    out_ref[:] = jnp.concatenate([gamma * area, g0, g1, g2], axis=0)


@functools.partial(jax.jit, static_argnames=())
def surface_corner_grads_pallas(p0, p1, p2, gamma_tri):
    """(E_tri, g0, g1, g2): fused surface energy + corner gradients.

    p0/p1/p2: (T, 3) corner positions; gamma_tri: (T,) per-triangle tension.
    """
    T = p0.shape[0]
    t_pad = max(-(-T // LANES) * LANES, LANES)
    tile = min(_TILE_T, t_pad)
    t_pad = -(-t_pad // tile) * tile  # grid covers the whole padded axis
    x = _pad_T(_stack_cm(p0, p1, p2), t_pad)  # (9, t_pad)
    g = _pad_T(gamma_tri[None, :], t_pad)  # (1, t_pad)
    grid = t_pad // tile
    out = pl.pallas_call(
        _surface_kernel,
        out_shape=jax.ShapeDtypeStruct((10, t_pad), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, g)
    e_tri = out[0, :T]
    g0 = out[1:4, :T].T
    g1 = out[4:7, :T].T
    g2 = out[7:10, :T].T
    return e_tri, g0, g1, g2


# ----------------------------------------------------------------------
# cotan curvature data (corners)
# ----------------------------------------------------------------------
def _curvature_kernel(p_ref, valid_ref, out_ref):
    p = p_ref[:]
    v0, v1, v2 = p[0:3], p[3:6], p[6:9]
    e0 = v2 - v1
    e1 = v0 - v2
    e2 = v1 - v0

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return jnp.stack(
            [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ]
        )

    l0_sq, l1_sq, l2_sq = dot(e0, e0), dot(e1, e1), dot(e2, e2)
    dbl = jnp.maximum(jnp.sqrt(jnp.maximum(dot(cross(e1, e2), cross(e1, e2)), 0.0)), EPS_AREA)
    c0 = dot(-e1, e2) / dbl
    c1 = dot(-e2, e0) / dbl
    c2 = dot(-e0, e1) / dbl

    mask = valid_ref[0, :]
    k0 = 0.5 * (c1[None, :] * (-e1) + c2[None, :] * e2) * mask[None, :]
    k1 = 0.5 * (c2[None, :] * (-e2) + c0[None, :] * e0) * mask[None, :]
    k2 = 0.5 * (c0[None, :] * (-e0) + c1[None, :] * e1) * mask[None, :]

    tri_areas = 0.5 * dbl
    obt0, obt1, obt2 = c0 < 0, c1 < 0, c2 < 0
    any_obt = obt0 | obt1 | obt2
    va0 = jnp.where(~any_obt, (l1_sq * c1 + l2_sq * c2) / 8.0, 0.0)
    va1 = jnp.where(~any_obt, (l2_sq * c2 + l0_sq * c0) / 8.0, 0.0)
    va2 = jnp.where(~any_obt, (l0_sq * c0 + l1_sq * c1) / 8.0, 0.0)
    va0 = jnp.where(obt0, tri_areas / 2.0, va0)
    va0 = jnp.where(obt1 | obt2, tri_areas / 4.0, va0)
    va1 = jnp.where(obt1, tri_areas / 2.0, va1)
    va1 = jnp.where(obt0 | obt2, tri_areas / 4.0, va1)
    va2 = jnp.where(obt2, tri_areas / 2.0, va2)
    va2 = jnp.where(obt0 | obt1, tri_areas / 4.0, va2)
    va = jnp.stack([va0 * mask, va1 * mask, va2 * mask])
    cot = jnp.stack([c0 * mask, c1 * mask, c2 * mask])
    out_ref[:] = jnp.concatenate(
        [cot, k0, k1, k2, va, tri_areas[None, :]], axis=0
    )  # (16, TILE)


@functools.partial(jax.jit, static_argnames=())
def curvature_corners_pallas(p0, p1, p2, valid):
    """(cot (T,3), k0, k1, k2 (T,3), va (T,3), tri_areas (T,)).

    The Meyer mixed-Voronoi corner-area branches and cotan weights of
    device/geo.curvature_data, fused into one lane pass.
    """
    T = p0.shape[0]
    t_pad = max(-(-T // LANES) * LANES, LANES)
    tile = min(_TILE_T, t_pad)
    t_pad = -(-t_pad // tile) * tile  # grid covers the whole padded axis
    x = _pad_T(_stack_cm(p0, p1, p2), t_pad)
    m = _pad_T(valid.astype(x.dtype)[None, :], t_pad)
    out = pl.pallas_call(
        _curvature_kernel,
        out_shape=jax.ShapeDtypeStruct((16, t_pad), x.dtype),
        grid=(t_pad // tile,),
        in_specs=[
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, m)
    cot = out[0:3, :T].T
    k0 = out[3:6, :T].T
    k1 = out[6:9, :T].T
    k2 = out[9:12, :T].T
    va = out[12:15, :T].T
    tri_areas = out[15, :T]
    return cot, k0, k1, k2, va, tri_areas


# ----------------------------------------------------------------------
# P1 tilt divergence + shape gradients
# ----------------------------------------------------------------------
def _p1_div_kernel(p_ref, t_ref, out_ref):
    p = p_ref[:]
    v0, v1, v2 = p[0:3], p[3:6], p[6:9]
    t = t_ref[:]
    t0, t1, t2 = t[0:3], t[3:6], t[6:9]
    e0 = v2 - v1
    e1 = v0 - v2
    e2 = v1 - v0

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return jnp.stack(
            [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ]
        )

    n = cross(e1, e2)  # = cross(v0-v2, v1-v0)
    n_sq = jnp.maximum(dot(n, n), EPS_AREA * EPS_AREA)  # geo.p1_shape_gradients clamp
    g0 = cross(n, e0) / n_sq[None, :]
    g1 = cross(n, e1) / n_sq[None, :]
    g2 = cross(n, e2) / n_sq[None, :]
    div = dot(t0, g0) + dot(t1, g1) + dot(t2, g2)
    area = 0.5 * jnp.sqrt(jnp.maximum(dot(n, n), 0.0))
    out_ref[:] = jnp.concatenate(
        [div[None, :], area[None, :], g0, g1, g2], axis=0
    )  # (11, TILE)


@functools.partial(jax.jit, static_argnames=())
def p1_divergence_pallas(p0, p1, p2, t0, t1, t2):
    """(div (T,), area (T,), g0, g1, g2 (T,3)): P1 divergence of a tilt field."""
    T = p0.shape[0]
    t_pad = max(-(-T // LANES) * LANES, LANES)
    tile = min(_TILE_T, t_pad)
    t_pad = -(-t_pad // tile) * tile  # grid covers the whole padded axis
    x = _pad_T(_stack_cm(p0, p1, p2), t_pad)
    t = _pad_T(_stack_cm(t0, t1, t2), t_pad)
    out = pl.pallas_call(
        _p1_div_kernel,
        out_shape=jax.ShapeDtypeStruct((11, t_pad), x.dtype),
        grid=(t_pad // tile,),
        in_specs=[
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((11, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, t)
    div = out[0, :T]
    area = out[1, :T]
    g0 = out[2:5, :T].T
    g1 = out[5:8, :T].T
    g2 = out[8:11, :T].T
    return div, area, g0, g1, g2
