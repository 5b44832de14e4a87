"""Fused Pallas kernel for the frozen-tilt inner-loop energy (TPU hot path).

One kernel pass evaluates, per triangle, the four triangle-supported frozen
tilt energies of the caveolin/Kozlov lanes:

    E_tri = k_in/2 * (|t_in corners|^2 / 3) * A_in
          + k_out/2 * (|t_out corners|^2 / 3) * A_out
          + kappa_in/2  * sum_c (base_in_c  - div_in )^2 va_in_c
          + kappa_out/2 * sum_c (base_out_c + div_out)^2 va_out_c
          + ks_in/4  * [w_in0 |d12_in|^2  + w_in1 |d20_in|^2  + w_in2 |d01_in|^2 ]
          + ks_out/4 * [w_out0 |d12_out|^2 + w_out1 |d20_out|^2 + w_out2 |d01_out|^2]

with div = sum_c t_c . g_c the P1 divergence (g = P1 shape gradients) —
(d_ij = t_i - t_j the Dirichlet corner differences, w the cotan weights) —
the same arithmetic as energy/tilt_leaflet.make_leaflet_tilt_frozen (lumped
mass), energy/bending_tilt_leaflet.make_leaflet_bending_tilt_frozen and
energy/tilt_smoothness_leaflet.make_leaflet_smoothness_frozen (ambient_v1
transport).
Parity targets: reference fortran_kernels/tilt_kernels.f90:26-86 (P1
divergence) + modules/energy/bending_tilt_leaflet corner forms; the
reference wires its Fortran kernels into this loop the same way
(fortran_kernels/loader.py:16-298).

The inner tilt CG evaluates this energy (and its tilt gradient) hundreds of
times per outer step with every positions-dependent field frozen, so a
single VMEM-resident pass replaces ~10 XLA fusions per evaluation.  The
backward pass is analytic (custom_vjp):

    dE/dt_in_c  = k_in * A_in / 3 * t_in_c  +  kappa_in  * S_in  * (-g_c)
    dE/dt_out_c = k_out * A_out/ 3 * t_out_c + kappa_out * S_out * (+g_c)
    with S = sum_c (base_c + s*div) * va_c, plus the Dirichlet part
    dE/dt0 = ks/2 (w2 d01 - w1 d20) (and its cyclic shifts).

Layout: component-major (C, T_pad) blocks so the triangle axis fills the
128-wide lanes; masking is folded into the frozen payloads (A and va are
zero on invalid/absent triangles).  f32-only, gated by
``pallas_enabled`` (default ON on TPU; interpreter mode elsewhere keeps the
parity tests runnable on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from membrane_solver_tpu.pallas_kernels.tri_kernels import LANES, _TILE_T, _interpret


def _pad_T(x, t_pad):
    return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1])))


def _cm(a):
    """(T, k, 3) corner array -> component-major (3k, T)."""
    T = a.shape[0]
    return a.reshape(T, -1).T


def _div_of(t, g):
    """Per-triangle P1 divergence from (9, TILE) corner stacks."""
    return (
        t[0] * g[0] + t[1] * g[1] + t[2] * g[2]
        + t[3] * g[3] + t[4] * g[4] + t[5] * g[5]
        + t[6] * g[6] + t[7] * g[7] + t[8] * g[8]
    )


def _dirichlet_sq(t):
    """|d12|^2, |d20|^2, |d01|^2 from a (9, TILE) corner stack."""
    sq = [None, None, None]
    for j, (a, b) in enumerate(((3, 6), (6, 0), (0, 3))):
        d0 = t[a] - t[b]
        d1 = t[a + 1] - t[b + 1]
        d2 = t[a + 2] - t[b + 2]
        sq[j] = d0 * d0 + d1 * d1 + d2 * d2
    return sq


def _fwd_kernel(tin_ref, tout_ref, g_ref, pay_ref, k_ref, out_ref):
    tin = tin_ref[:]    # (9, TILE)
    tout = tout_ref[:]  # (9, TILE)
    g = g_ref[:]        # (9, TILE)
    pay = pay_ref[:]    # (20, TILE): A_in, A_out, base_in(3), va_in(3),
    #                       base_out(3), va_out(3), w_in(3), w_out(3)
    k_in, k_out, kap_in, kap_out = k_ref[0], k_ref[1], k_ref[2], k_ref[3]
    ks_in, ks_out = k_ref[4], k_ref[5]

    sq_in = sum(tin[i] * tin[i] for i in range(9))
    sq_out = sum(tout[i] * tout[i] for i in range(9))
    e = 0.5 * k_in * (sq_in / 3.0) * pay[0] + 0.5 * k_out * (sq_out / 3.0) * pay[1]

    div_in = _div_of(tin, g)
    div_out = _div_of(tout, g)
    for c in range(3):
        term_in = pay[2 + c] - div_in
        term_out = pay[8 + c] + div_out
        e = e + 0.5 * kap_in * term_in * term_in * pay[5 + c]
        e = e + 0.5 * kap_out * term_out * term_out * pay[11 + c]

    s_in = _dirichlet_sq(tin)
    s_out = _dirichlet_sq(tout)
    e = e + 0.25 * ks_in * sum(pay[14 + j] * s_in[j] for j in range(3))
    e = e + 0.25 * ks_out * sum(pay[17 + j] * s_out[j] for j in range(3))
    out_ref[:] = e[None, :]


def _bwd_kernel(tin_ref, tout_ref, g_ref, pay_ref, k_ref, din_ref, dout_ref):
    tin = tin_ref[:]
    tout = tout_ref[:]
    g = g_ref[:]
    pay = pay_ref[:]
    k_in, k_out, kap_in, kap_out = k_ref[0], k_ref[1], k_ref[2], k_ref[3]
    ks_in, ks_out = k_ref[4], k_ref[5]

    div_in = _div_of(tin, g)
    div_out = _div_of(tout, g)
    s_in = sum((pay[2 + c] - div_in) * pay[5 + c] for c in range(3))
    s_out = sum((pay[8 + c] + div_out) * pay[11 + c] for c in range(3))
    m_in = k_in * pay[0] / 3.0
    m_out = k_out * pay[1] / 3.0
    coef_in = kap_in * s_in
    coef_out = kap_out * s_out

    def dirichlet_grads(t, w0, w1, w2, half_k):
        # dE/dt0 = ks/2 (w2 d01 - w1 d20); dt1 = ks/2 (w0 d12 - w2 d01);
        # dt2 = ks/2 (w1 d20 - w0 d12)  — per xyz component
        rows = []
        for c in range(3):
            d12 = t[3 + c] - t[6 + c]
            d20 = t[6 + c] - t[c]
            d01 = t[c] - t[3 + c]
            rows.append((c, half_k * (w2 * d01 - w1 * d20),
                         half_k * (w0 * d12 - w2 * d01),
                         half_k * (w1 * d20 - w0 * d12)))
        out = [None] * 9
        for c, g0, g1, g2 in rows:
            out[c], out[3 + c], out[6 + c] = g0, g1, g2
        return out

    sm_in = dirichlet_grads(tin, pay[14], pay[15], pay[16], 0.5 * ks_in)
    sm_out = dirichlet_grads(tout, pay[17], pay[18], pay[19], 0.5 * ks_out)
    din_ref[:] = jnp.stack(
        [m_in * tin[i] - coef_in * g[i] + sm_in[i] for i in range(9)]
    )
    dout_ref[:] = jnp.stack(
        [m_out * tout[i] + coef_out * g[i] + sm_out[i] for i in range(9)]
    )


def _call(kernel, outs, tin_cm, tout_cm, g_cm, pay_cm, k_vec):
    T = tin_cm.shape[1]
    t_pad = max(-(-T // LANES) * LANES, LANES)
    tile = min(_TILE_T, t_pad)
    t_pad = -(-t_pad // tile) * tile
    args = (
        _pad_T(tin_cm, t_pad),
        _pad_T(tout_cm, t_pad),
        _pad_T(g_cm, t_pad),
        _pad_T(pay_cm, t_pad),
        k_vec,
    )
    grid = (t_pad // tile,)
    in_specs = [
        pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((20, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if outs == 1:
        out_shape = jax.ShapeDtypeStruct((1, t_pad), tin_cm.dtype)
        out_specs = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((9, t_pad), tin_cm.dtype),
            jax.ShapeDtypeStruct((9, t_pad), tin_cm.dtype),
        )
        out_specs = (
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_interpret(),
    )(*args), T


@jax.custom_vjp
def fused_tilt_energy(tin_c, tout_c, g, payload, k_vec):
    """Scalar frozen-tilt energy of the 4 triangle modules.

    tin_c/tout_c: (T, 3, 3) gathered corner tilts; g: (T, 3, 3) P1 shape
    gradients; payload: (T, 20) frozen fields (see _fwd_kernel); k_vec:
    (6,) [k_in, k_out, kappa_in, kappa_out, ks_in, ks_out].
    """
    out, _pad = _call(_fwd_kernel, 1, _cm(tin_c), _cm(tout_c), _cm(g), payload.T, k_vec)
    return jnp.sum(out[0, : tin_c.shape[0]])


def _fused_fwd(tin_c, tout_c, g, payload, k_vec):
    return fused_tilt_energy(tin_c, tout_c, g, payload, k_vec), (
        tin_c,
        tout_c,
        g,
        payload,
        k_vec,
    )


def _fused_bwd(res, ct):
    tin_c, tout_c, g, payload, k_vec = res
    (din, dout), _pad = _call(
        _bwd_kernel, 2, _cm(tin_c), _cm(tout_c), _cm(g), payload.T, k_vec
    )
    T = tin_c.shape[0]
    din = (ct * din[:, :T]).T.reshape(T, 3, 3)
    dout = (ct * dout[:, :T]).T.reshape(T, 3, 3)
    zero_pay = jnp.zeros_like(payload)
    zero_g = jnp.zeros_like(g)
    zero_k = jnp.zeros_like(k_vec)
    return din, dout, zero_g, zero_pay, zero_k


fused_tilt_energy.defvjp(_fused_fwd, _fused_bwd)


def reference_energy(tin_c, tout_c, g, payload, k_vec):
    """Pure-jnp oracle with the identical arithmetic (parity tests)."""
    A_in, A_out = payload[:, 0], payload[:, 1]
    base_in, va_in = payload[:, 2:5], payload[:, 5:8]
    base_out, va_out = payload[:, 8:11], payload[:, 11:14]
    w_in, w_out = payload[:, 14:17], payload[:, 17:20]
    k_in, k_out, kap_in, kap_out, ks_in, ks_out = k_vec
    sq_in = jnp.sum(tin_c * tin_c, axis=(1, 2))
    sq_out = jnp.sum(tout_c * tout_c, axis=(1, 2))
    e = 0.5 * k_in * (sq_in / 3.0) * A_in + 0.5 * k_out * (sq_out / 3.0) * A_out
    div_in = jnp.sum(tin_c * g, axis=(1, 2))
    div_out = jnp.sum(tout_c * g, axis=(1, 2))
    term_in = base_in - div_in[:, None]
    term_out = base_out + div_out[:, None]
    e = e + 0.5 * kap_in * jnp.sum(term_in**2 * va_in, axis=1)
    e = e + 0.5 * kap_out * jnp.sum(term_out**2 * va_out, axis=1)

    def dir_sq(t):
        d12 = t[:, 1] - t[:, 2]
        d20 = t[:, 2] - t[:, 0]
        d01 = t[:, 0] - t[:, 1]
        return jnp.stack(
            [
                jnp.sum(d12 * d12, axis=1),
                jnp.sum(d20 * d20, axis=1),
                jnp.sum(d01 * d01, axis=1),
            ],
            axis=1,
        )

    e = e + 0.25 * ks_in * jnp.sum(w_in * dir_sq(tin_c), axis=1)
    e = e + 0.25 * ks_out * jnp.sum(w_out * dir_sq(tout_c), axis=1)
    return jnp.sum(e)
