"""DP sweep axis (`parallel/sweep.py`) on the 8-device virtual mesh.

The reference has no distributed execution; its embarrassingly-parallel
axis is parameter sweeps over mesh families (SURVEY §2.10).  This lane
pins the vmapped+sharded sweep: member-0 parity vs a single-device run,
actual 8-device placement of the batched state, and member divergence
under distinct parameters.

All multi-device compiles run in ONE forked subprocess — compiling
8-virtual-device host executables inside the long-lived pytest process
SIGSEGVs XLA:CPU once hundreds of programs accumulate (see
tests/test_tensor_parallel.py and tools/repro_xlacpu_multidevice_crash.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_tensor_parallel import run_multidevice_driver

_DRIVER = r"""
import json, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import Mesh

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.parallel.sweep import SWEEP_AXIS, run_sweep

out = {"n_dev": len(jax.devices())}

problem = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True).problem()
device_mesh = Mesh(np.array(jax.devices()[:8]), (SWEEP_AXIS,))

# a radial-dilation + rim-strength scan: the reference's real sweep axes
base_pos = np.asarray(problem.state.positions)
member_positions = [base_pos * (1.0 + 0.01 * i) for i in range(8)]
member_params = [
    {"tilt_rim_source_strength_in": 100.0 * (1.0 + 0.1 * i)} for i in range(8)
]
states, _stepper, stats = run_sweep(
    problem, member_params,
    member_positions=member_positions,
    n_steps=2, step_size=1e-3, device_mesh=device_mesh,
)
jax.block_until_ready(states.positions)
energies = np.asarray(stats.energy)

out["energies"] = [float(e) for e in energies]
out["pos_devset"] = len(states.positions.sharding.device_set)
out["pos_finite"] = bool(np.isfinite(np.asarray(states.positions)).all())

# member-0 parity: the same member run WITHOUT the device mesh
single_states, _ss, single_stats = run_sweep(
    problem, member_params[:1],
    member_positions=member_positions[:1],
    n_steps=2, step_size=1e-3, device_mesh=None,
)
e_single = float(np.asarray(single_stats.energy)[0])
out["member0_energy_diff"] = abs(float(energies[0]) - e_single)
out["member0_pos_max_diff"] = float(
    np.max(np.abs(np.asarray(states.positions)[0] - np.asarray(single_states.positions)[0]))
)

print("SWEEP_RESULT " + json.dumps(out))
"""


@pytest.fixture(scope="module")
def sweep_results() -> dict:
    return run_multidevice_driver(_DRIVER, "SWEEP_RESULT")


def test_sweep_runs_on_all_devices(sweep_results):
    r = sweep_results
    assert r["n_dev"] == 8
    assert r["pos_devset"] == 8, "batched sweep state was not sharded over the mesh"
    assert r["pos_finite"]


def test_sweep_member0_matches_single_device(sweep_results):
    r = sweep_results
    e0 = abs(r["energies"][0])
    assert r["member0_energy_diff"] <= 1e-9 * max(e0, 1.0)
    assert r["member0_pos_max_diff"] <= 1e-9


def test_sweep_members_diverge_under_distinct_params(sweep_results):
    e = np.asarray(sweep_results["energies"])
    assert np.all(np.isfinite(e))
    # distinct dilations + rim strengths must give distinct trajectories
    assert len(np.unique(np.round(e, 9))) == len(e)
