"""membrane_solver_tpu — a TPU-native Surface-Evolver-style membrane energy minimizer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``AvishaiBarnoy/membrane_solver`` (see /root/reference): triangulated-mesh
energy minimization over vertex positions and per-vertex bilayer tilt fields,
with pluggable energy functionals and hard constraints, Evolver-style mesh
operations (refine / equiangulate / vertex-average), an interactive CLI, and
a benchmark + acceptance-test harness.

Architecture (TPU-first, not a port):

- Host layer (`geometry`, `runtime.refinement`, ...): a light entity mesh used
  for I/O, topology surgery, and option/tag bookkeeping.  Topology changes are
  index-rewrite passes producing new dense index buffers.
- Device layer (`device`, `energy`, `constraints`, `runtime.jit_core`): all
  per-step numerics are pure functions of capacity-padded SoA arrays
  (positions, tilts, triangle rows, edge rows, masks, per-facet parameters),
  compiled once with `jax.jit` and re-used across topology changes of the same
  padded capacity.  Gradients come from `jax.grad` through the shared geometry
  context; hot kernels have fused Pallas implementations.
- Minimization (`runtime.minimizer`): an Evolver-compatible outer loop whose
  inner iteration blocks (energy/gradient assembly, KKT constraint projection,
  Armijo line search with normal-flip safety, tilt inner solves) run as jitted
  fixed-shape `lax.while_loop`s on device.

Precision: the solver runs in float64 (like the reference); importing this
package enables JAX x64 mode.
"""

from __future__ import annotations

import os

# cached CPU executables log a spurious machine-feature-mismatch ERROR per
# load (XLA records tuning flags like +prefer-no-gather in the feature list
# and the loader compares them against host CPU features); the env var must
# be set before the jaxlib extension loads to take effect
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# Precision: float64 by default (parity with the reference solver).  Set
# MEMBRANE_SOLVER_X64=0 to run in float32 — the high-throughput mode for TPU
# hardware, whose f64 support is software-emulated.
if os.environ.get("MEMBRANE_SOLVER_X64", "1") not in {"0", "false", "no"}:
    jax.config.update("jax_enable_x64", True)

# Matmul precision: full float32 for every dot/matmul/einsum.  On TPU the
# DEFAULT matmul precision runs f32 contractions as single-pass bfloat16 on
# the MXU (~8 mantissa bits), which injected ~1e-2 relative error into the
# KKT projector solves (G @ G.T, lam @ G in jit_core/tilt_relax) and CG
# coefficient dots — measured as the 2.6e-3 f32-vs-f64 trajectory deviation
# on the kozlov lane (benchmarks/f32_parity.json r4) versus 4e-5 for the
# same lane in IEEE f32 on CPU.  This workload's only large MXU matmuls are
# the one-hot scatter/gathers, which already pin HIGHEST (device/geo.py:128)
# because one-hot contractions must be exact; everything else is tiny
# (k x 3N KKT rows, 3-vector dots), so HIGHEST costs nothing measurable.
# Override with MEMBRANE_SOLVER_MATMUL_PRECISION=default/high/highest.
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("MEMBRANE_SOLVER_MATMUL_PRECISION", "highest"),
)

# Persistent compilation cache: the minimize block recompiles per padded
# capacity (a refinement ladder hits 3-4 capacities); caching the executables
# on disk makes every later process start warm.  Disable with
# MEMBRANE_SOLVER_COMPILE_CACHE=0 or point it elsewhere with =<dir>.
_cache = os.environ.get("MEMBRANE_SOLVER_COMPILE_CACHE", "1")
if _cache not in {"0", "false", "no"}:
    if _cache not in {"1", "true", "yes"}:
        _cache_dir = _cache
    else:
        # partition by host CPU identity: executables cached on a machine
        # with a different feature set (the VM fleet mixes avx512 variants)
        # are not merely slow to load — deserializing them can SIGSEGV
        # inside get_executable_and_time.  The identity comes from RUNTIME
        # CPUID (utils/cpu_identity.py), not /proc/cpuinfo: the fleet
        # live-migrates VMs without a reboot, /proc/cpuinfo goes stale at
        # boot, but LLVM's codegen tuning (+prefer-no-gather/...) follows
        # what CPUID reports NOW — a /proc-keyed directory served
        # mismatched AOT entries after such a migration (observed
        # 2026-08-18).  A per-identity directory means mismatched entries
        # are never even seen.
        try:
            from membrane_solver_tpu.utils.cpu_identity import cpu_fingerprint

            _feat = "c" + cpu_fingerprint()
        except Exception:
            _feat = "nofeat"
        _cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "membrane_solver_tpu", f"xla-{_feat}"
        )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache small executables too: the classic lanes compile many
        # sub-second programs per capacity epoch (a cold cube recipe spends
        # ~4.5 s in 27 ms compiles that a warm cache loads in ~1 ms each)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.02)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is best-effort; never block solving
        pass

__version__ = "0.1.0"

from membrane_solver_tpu.core.parameters import GlobalParameters, ParameterResolver  # noqa: E402
from membrane_solver_tpu.geometry.io_readers import load_data, parse_geometry  # noqa: E402
from membrane_solver_tpu.geometry.io_writers import save_geometry  # noqa: E402
from membrane_solver_tpu.geometry.mesh import Mesh  # noqa: E402
from membrane_solver_tpu.runtime.minimizer import Minimizer  # noqa: E402

__all__ = [
    "GlobalParameters",
    "ParameterResolver",
    "Mesh",
    "Minimizer",
    "load_data",
    "parse_geometry",
    "save_geometry",
    "__version__",
]
