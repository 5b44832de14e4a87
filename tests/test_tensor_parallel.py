"""Tensor-parallel (vertex-sharded) evaluation on the 8-device virtual mesh.

Shards the padded vertex/triangle axes over a "tp" mesh axis and checks
the energy+gradient (and a full minimize step) match the single-device
result bitwise-closely; XLA inserts the all-gather/reduce-scatter
collectives from the NamedSharding annotations (SURVEY 2.10's TP row).

ALL multi-device work runs in ONE forked subprocess (module-scoped
fixture below).  Compiling 8-virtual-device host executables inside a
long-lived pytest process that already holds hundreds of compiled
programs SIGSEGVs in XLA:CPU's backend_compile_and_load (reproducibly at
~test 227 of the full suite; standalone the same compiles always pass) —
the same XLA:CPU multi-device instability class documented in
utils/xla_cache.py.  Subprocess isolation is the fix the round-4 verdict
prescribed; tools/repro_xlacpu_multidevice_crash.py records the repro.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = str(Path(__file__).resolve().parent.parent)

_DRIVER = r"""
import json, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.parallel import tensor as tp
from membrane_solver_tpu.runtime import jit_core

out = {"n_dev": len(jax.devices())}

p = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True).problem()
mesh = tp.tp_mesh(8)

# --- base lane: energy+gradient parity vs single device -------------------
E_ref, g_ref = tp.jit_core.make_energy_vg(p.spec)(
    p.state.positions, p.state, p.topo, p.params
)
state, topo = tp.shard_problem(p, mesh)
run = tp.tp_energy_and_grad(p.spec, mesh)
E, g = run(state, topo, p.params)
g_ref_np, g_np = np.asarray(g_ref), np.asarray(g)
out["base"] = {
    "E_rel": abs(float(E) - float(E_ref)) / max(abs(float(E_ref)), 1.0),
    "g_max_abs_diff": float(np.max(np.abs(g_np - g_ref_np))),
    "g_max_rel_diff": float(
        np.max(np.abs(g_np - g_ref_np) / (np.abs(g_ref_np) + 1e-12))
    ),
    "g_devset": len(g.sharding.device_set),
    "state_devset": len(state.positions.sharding.device_set),
}

# --- compiled HLO must contain cross-device collectives --------------------
hlo = run.lower(state, topo, p.params).compile().as_text()
out["hlo_has_collectives"] = any(
    op in hlo
    for op in ("all-gather", "all-reduce", "reduce-scatter", "collective-permute")
)

# --- refined (L2) lane: larger axes, segment sums cross shard boundaries ---
from membrane_solver_tpu.runtime.refinement import (
    refine_polygonal_facets,
    refine_triangle_mesh,
)

mn = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True)
for _ in range(2):
    m = refine_polygonal_facets(mn.mesh)
    m = refine_triangle_mesh(m)
    mn.mesh = m
    mn.invalidate()
    mn.enforce_constraints_after_mesh_ops()
pr = mn.problem()
E_ref2, g_ref2 = tp.jit_core.make_energy_vg(pr.spec)(
    pr.state.positions, pr.state, pr.topo, pr.params
)
state2, topo2 = tp.shard_problem(pr, mesh)
run2 = tp.tp_energy_and_grad(pr.spec, mesh)
E2, g2 = run2(state2, topo2, pr.params)
g_ref2_np, g2_np = np.asarray(g_ref2), np.asarray(g2)
out["refined"] = {
    "E_rel": abs(float(E2) - float(E_ref2)) / max(abs(float(E_ref2)), 1.0),
    "g_max_abs_diff": float(np.max(np.abs(g2_np - g_ref2_np))),
    "g_max_rel_diff": float(
        np.max(np.abs(g2_np - g_ref2_np) / (np.abs(g_ref2_np) + 1e-11))
    ),
    "g_devset": len(g2.sharding.device_set),
}

# --- full TP minimize block step -------------------------------------------
options = jit_core.MinimizeOptions(step_size_mode="fixed", enforce_in_line_search=True)
block = tp.tp_minimize_block(p.spec, options, mesh)
stepper = jit_core.fresh_stepper_state(p.spec.nv_cap, kind="gradient_descent")
new_state, _stepper, stats = block(
    state, topo, p.params, stepper,
    jnp.asarray(1, jnp.int32), jnp.asarray(0.005), jnp.asarray(0.005),
    jnp.asarray(0.0), jnp.asarray(1e-8), jnp.asarray(10, jnp.int32),
    jnp.asarray(0, jnp.int32), jnp.asarray(5, jnp.int32),
)
out["block"] = {
    "energy": float(stats.energy),
    "finite": bool(np.isfinite(np.asarray(new_state.positions)).all()),
}

print("TP_RESULT " + json.dumps(out))
"""


def run_multidevice_driver(code: str, tag: str, timeout: int = 1200) -> dict:
    """Run a multi-device driver snippet in a forked subprocess.

    The subprocess gets a fresh 8-virtual-device CPU platform (XLA_FLAGS)
    and must print one line ``<tag> <json>``.  Shared by the TP and sweep
    test modules so no 8-device executable is ever compiled in the
    long-lived pytest process.
    """
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code.replace("__REPO__", json.dumps(REPO))],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    res = None
    for line in out.stdout.splitlines():
        if line.startswith(tag + " "):
            res = json.loads(line[len(tag) + 1 :])
    assert res is not None, (
        f"driver produced no {tag} line (rc={out.returncode})\n"
        + out.stdout[-2000:]
        + out.stderr[-2000:]
    )
    return res


@pytest.fixture(scope="module")
def tp_results() -> dict:
    return run_multidevice_driver(_DRIVER, "TP_RESULT")


def test_tp_energy_grad_matches_single_device(tp_results):
    r = tp_results
    assert r["n_dev"] == 8
    assert r["base"]["E_rel"] < 1e-12
    assert r["base"]["g_max_abs_diff"] < 1e-11
    # the computation actually ran on the 8-device mesh (not single-device)
    assert r["base"]["g_devset"] == 8
    assert r["base"]["state_devset"] == 8


def test_tp_compiled_hlo_contains_collectives(tp_results):
    """XLA must actually insert cross-device collectives for the sharded
    energy+gradient program (not silently replicate the whole computation)."""
    assert tp_results["hlo_has_collectives"], (
        "no collectives in the compiled TP program; sharding was dropped"
    )


def test_tp_refined_lane_matches_single_device(tp_results):
    """TP parity on a refined (L2) mesh — larger vertex/triangle axes so the
    sharded segment sums cross shard boundaries many times."""
    r = tp_results["refined"]
    assert r["g_devset"] == 8
    assert tp_results["refined"]["E_rel"] < 1e-10
    assert r["g_max_rel_diff"] < 1e-8 or r["g_max_abs_diff"] < 1e-10


def test_tp_minimize_block_runs_sharded(tp_results):
    r = tp_results["block"]
    assert r["finite"]
    assert np.isfinite(r["energy"])
