"""Tensor-parallel (vertex-sharded) evaluation on the 8-device virtual mesh.

Shards the padded vertex/triangle axes over a "tp" mesh axis and checks
the energy+gradient (and a full minimize step) match the single-device
result bitwise-closely; XLA inserts the all-gather/reduce-scatter
collectives from the NamedSharding annotations (SURVEY 2.10's TP row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.parallel import tensor as tp


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """Multi-device host-platform executables abort inside the persistent
    cache's get_executable_and_time on deserialization (utils/xla_cache.py);
    keep every compile in this module off the cache — including .lower()
    /.compile() inspection paths that bypass the library wrappers."""
    from membrane_solver_tpu.utils.xla_cache import (
        disable_persistent_cache,
        restore_persistent_cache,
    )

    prev = disable_persistent_cache()
    try:
        yield
    finally:
        restore_persistent_cache(prev)


@pytest.fixture(scope="module")
def problem():
    mesh = parse_geometry(build("kozlov_1disk"))
    mn = Minimizer(mesh, quiet=True)
    return mn.problem()


def test_tp_energy_grad_matches_single_device(problem):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = problem
    E_ref, g_ref = tp.jit_core.make_energy_vg(p.spec)(
        p.state.positions, p.state, p.topo, p.params
    )

    mesh = tp.tp_mesh(8)
    state, topo = tp.shard_problem(p, mesh)
    run = tp.tp_energy_and_grad(p.spec, mesh)
    E, g = run(state, topo, p.params)
    assert abs(float(E) - float(E_ref)) < 1e-12 * max(abs(float(E_ref)), 1.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-12, atol=1e-12)
    # the computation actually ran on the 8-device mesh (not single-device);
    # conftest forces the 8-device virtual platform, so require exactly 8
    assert len(g.sharding.device_set) == 8
    assert len(state.positions.sharding.device_set) == 8


def test_tp_compiled_hlo_contains_collectives(problem):
    """XLA must actually insert cross-device collectives for the sharded
    energy+gradient program (not silently replicate the whole computation)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = problem
    mesh = tp.tp_mesh(8)
    state, topo = tp.shard_problem(p, mesh)
    run = tp.tp_energy_and_grad(p.spec, mesh)
    hlo = run.lower(state, topo, p.params).compile().as_text()
    collective_ops = ("all-gather", "all-reduce", "reduce-scatter", "collective-permute")
    assert any(op in hlo for op in collective_ops), (
        "no collectives in the compiled TP program; sharding was dropped"
    )


def test_tp_refined_lane_matches_single_device(problem):
    """TP parity on a refined (L2) mesh — larger vertex/triangle axes so the
    sharded segment sums cross shard boundaries many times."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from membrane_solver_tpu.runtime.refinement import (
        refine_polygonal_facets,
        refine_triangle_mesh,
    )

    mesh_obj = parse_geometry(build("kozlov_1disk"))
    mn = Minimizer(mesh_obj, quiet=True)
    for _ in range(2):
        m = refine_polygonal_facets(mn.mesh)
        m = refine_triangle_mesh(m)
        mn.mesh = m
        mn.invalidate()
        mn.enforce_constraints_after_mesh_ops()
    p = mn.problem()
    E_ref, g_ref = tp.jit_core.make_energy_vg(p.spec)(
        p.state.positions, p.state, p.topo, p.params
    )
    mesh = tp.tp_mesh(8)
    state, topo = tp.shard_problem(p, mesh)
    run = tp.tp_energy_and_grad(p.spec, mesh)
    E, g = run(state, topo, p.params)
    assert len(g.sharding.device_set) == 8
    assert abs(float(E) - float(E_ref)) < 1e-10 * max(abs(float(E_ref)), 1.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-9, atol=1e-11)


_BLOCK_DRIVER = r"""
import json, sys
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.parallel import tensor as tp
from membrane_solver_tpu.runtime import jit_core

p = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True).problem()
mesh = tp.tp_mesh(8)
state, topo = tp.shard_problem(p, mesh)
options = jit_core.MinimizeOptions(step_size_mode="fixed", enforce_in_line_search=True)
block = tp.tp_minimize_block(p.spec, options, mesh)
stepper = jit_core.fresh_stepper_state(p.spec.nv_cap, kind="gradient_descent")
new_state, _stepper, stats = block(
    state, topo, p.params, stepper,
    jnp.asarray(1, jnp.int32), jnp.asarray(0.005), jnp.asarray(0.005),
    jnp.asarray(0.0), jnp.asarray(1e-8), jnp.asarray(10, jnp.int32),
    jnp.asarray(0, jnp.int32), jnp.asarray(5, jnp.int32),
)
print("TP_RESULT " + json.dumps({
    "energy": float(stats.energy),
    "finite": bool(np.isfinite(np.asarray(new_state.positions)).all()),
    "n_dev": len(jax.devices()),
}))
"""


def test_tp_minimize_block_runs_sharded():
    """Runs in a SUBPROCESS: compiling the 8-device minimize block inside a
    long-lived process that already holds ~170 tests' executables
    SIGSEGVs in XLA:CPU's backend_compile_and_load (standalone it always
    passes) — same isolation the theory-parity lanes use."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    out = subprocess.run(
        [sys.executable, "-c", _BLOCK_DRIVER.replace("__REPO__", repo)],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
    )
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("TP_RESULT "):
            import json

            res = json.loads(line[len("TP_RESULT "):])
    assert res is not None, out.stdout[-2000:] + out.stderr[-2000:]
    assert res["n_dev"] == 8
    assert res["finite"]
    assert np.isfinite(res["energy"])
