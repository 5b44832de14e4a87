"""Latency-aware compute placement for single-device problems.

TPU throughput wins once the padded mesh is large enough to fill the
vector lanes, but a small interactive problem is latency-bound: every
fused region in the minimize program costs ~5-15 us on the device
regardless of how little data it touches, so a 512-row problem pays the
same per-op floor as a 16k-row one.  Measured on the kozlov hard-rim
lane (436 vertices, padded 512): 17.5 ms/step on the TPU in f32 vs
3.3 ms/step on XLA:CPU — while at L3 (6.6k vertices) the TPU wins by
>100x over the NumPy reference and ~3x over XLA:CPU.

The threshold is dtype-aware because the TPU emulates float64: measured
on this host (kozlov lane, ms/step, f64) — cap 256: TPU 73.8 vs CPU
4.6; cap 1024: 147.9 vs 11.9; cap 4096: 176.8 vs 58.6; cap 16384 (L3):
~450 vs 447 — the f64 crossover sits near 16k rows, while in f32 the
TPU already wins ~3x at L3 and loses only below ~2k rows.

This mirrors the reference's own engine dispatch (its Fortran loader
picks the fast kernel when available and falls back otherwise,
fortran_kernels/loader.py:16-298): the framework routes a problem to
the backend that wins at its size, and the user can pin either.

Policy (env `MEMBRANE_SOLVER_BACKEND`):
- ``auto`` (default): on an accelerator host, place problems whose
  padded vertex capacity is at most `MEMBRANE_SOLVER_SMALL_MESH_CPU_MAX`
  (default 2048 in f32, 8192 in f64) on the co-resident XLA:CPU
  backend; larger problems stay on the accelerator.
- ``cpu``: always place on XLA:CPU.
- ``tpu`` / ``default`` / ``accelerator``: never re-place (benchmarks
  pin this so a "tpu" number is always a TPU number).

The policy is a no-op when the default backend already is CPU (the test
suite, `--cpu` CLI runs, parity lanes) and in multi-device programs
(sweep/tensor parallelism manage their own shardings).
"""

from __future__ import annotations

import os


def small_mesh_cpu_max() -> int:
    raw = os.environ.get("MEMBRANE_SOLVER_SMALL_MESH_CPU_MAX")
    if raw is not None:
        return int(raw)
    from membrane_solver_tpu.utils.precision import default_float
    import jax.numpy as jnp

    return 8192 if default_float() == jnp.float64 else 2048


def compute_device(nv_cap: int):
    """Device to place a single-device problem on, or None for default."""
    import jax

    mode = os.environ.get("MEMBRANE_SOLVER_BACKEND", "auto").strip().lower()
    if mode in {"tpu", "default", "accelerator", ""}:
        return None
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        return None
    if not cpus:
        return None
    if mode == "cpu":
        return cpus[0]
    # auto
    if jax.default_backend() == "cpu":
        return None
    if len(jax.devices()) != 1:
        return None  # multi-device session: shardings own placement
    if nv_cap <= small_mesh_cpu_max():
        return cpus[0]
    return None


def effective_backend() -> str:
    """The platform computations actually run on.

    ``jax.default_backend()`` ignores ``jax_default_device``, so after
    :func:`apply_placement` routes a small problem to XLA:CPU the
    backend-specialized kernels (dense-solver strategy, one-hot scatter,
    slot-projector matmuls) would otherwise still take their accelerator
    paths on CPU-placed arrays.
    """
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()


_PLACED = False


def apply_placement(nv_cap: int) -> None:
    """Set (or restore) the session default device per :func:`compute_device`.

    The default device — not per-array commitment — is what routes the
    downstream scalar and params construction to the chosen backend; on a
    tunneled TPU, creating each build_params scalar device-side and
    shipping it back costs more than the compute itself.
    """
    global _PLACED
    import jax

    dev = compute_device(nv_cap)
    if dev is not None:
        jax.config.update("jax_default_device", dev)
        _PLACED = True
    elif _PLACED:
        jax.config.update("jax_default_device", None)
        _PLACED = False
