"""Pallas TPU kernels for the per-triangle hot loops.

TPU-native replacements for the reference's three f2py Fortran kernels
(reference fortran_kernels/surface_energy.f90:27-99,
bending_kernels.f90:32-131, tilt_kernels.f90:26-190).  The design split
is deliberate: XLA keeps the irregular data movement (corner gathers,
vertex scatter-adds — which it lowers to MXU one-hot matmuls on TPU, see
device/geo.scatter_add_rows), while Pallas fuses the arithmetic-dense
per-triangle middle into a single VMEM pass in component-major ``(C, T)``
layout so the triangle axis rides the 128-wide VPU lanes.

Enable with ``MEMBRANE_SOLVER_PALLAS=1`` (f32 arrays only; f64 stays on
the stock XLA path).  Off-TPU the kernels run in interpreter mode, which
the parity tests use to pin bit-level agreement with device/geo.
"""

from __future__ import annotations

from membrane_solver_tpu.pallas_kernels.tri_kernels import (
    curvature_corners_pallas,
    p1_divergence_pallas,
    pallas_enabled,
    surface_corner_grads_pallas,
)

__all__ = [
    "curvature_corners_pallas",
    "p1_divergence_pallas",
    "pallas_enabled",
    "surface_corner_grads_pallas",
]
