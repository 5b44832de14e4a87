"""Opt-in on-TPU smoke tier (``pytest -m tpu``).

The default suite pins JAX to CPU (conftest), so the f32-on-TPU mode that
produces the headline benchmark number is otherwise never exercised by a
test.  This lane runs ON THE REAL TPU in a subprocess (one process at a
time — concurrent clients deadlock the axon tunnel):

1. the fused frozen-tilt Pallas kernel's inner relax on the kozlov lane,
   f32 on TPU, against the same relax with the Pallas path disabled
   (stock XLA) on the same device;
2. a 10-step L1 kozlov coupled minimize, f32-TPU vs f64-CPU, within the
   recorded trajectory tolerance (benchmarks/f32_parity.json is the
   per-lane hardware record; kozlov@tpu measured 2.7e-6 max relative
   energy deviation over 40 steps, 2026-08-19).

Excluded by default via pytest.ini; run with  pytest -m tpu tests/test_tpu_smoke.py
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

_TPU_DRIVER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
import os
os.environ["MEMBRANE_SOLVER_X64"] = "0"
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
import numpy as np

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build

gp = {
    "tilt_solve_mode": "coupled", "tilt_step_size": 0.15,
    "tilt_inner_steps": 40, "tilt_tol": 1e-10,
    "step_size": 0.005, "step_size_mode": "fixed",
}

def run(pallas_on: bool):
    os.environ["MEMBRANE_SOLVER_FROZEN_TILT"] = "1" if pallas_on else "0"
    # module-level gates read the env at call time via tilt_relax
    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(gp)
    mn = Minimizer(mesh, quiet=True)
    mn.step_size = 0.005
    energies = []
    for _ in range(10):
        mn.minimize(1)
        energies.append(float(mn.compute_energy()))
    return energies

e_pallas = run(True)
e_xla = run(False)

# latency-aware auto-placement (utils/placement.py): on this accelerator
# host a small problem must compile+run on the co-resident XLA:CPU
# backend and reproduce the pinned-TPU trajectory in the same dtype
os.environ["MEMBRANE_SOLVER_FROZEN_TILT"] = "1"
os.environ["MEMBRANE_SOLVER_BACKEND"] = "auto"
mesh = parse_geometry(build("kozlov_1disk"))
mesh.global_parameters.update(gp)
mn = Minimizer(mesh, quiet=True)
mn.step_size = 0.005
p = mn.problem()
placed = list(p.state.positions.devices())[0].platform
mn.minimize(3)
e_auto = float(mn.compute_energy())
os.environ["MEMBRANE_SOLVER_BACKEND"] = "default"

print("TPU_RESULT " + json.dumps(
    {"pallas": e_pallas, "xla": e_xla, "auto_platform": placed, "auto_e3": e_auto}
))
"""


@pytest.mark.tpu
def test_tpu_frozen_tilt_and_minimize_smoke():
    out = subprocess.run(
        [sys.executable, "-c", _TPU_DRIVER],
        capture_output=True,
        text=True,
        timeout=1800,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k not in {"JAX_PLATFORMS", "XLA_FLAGS"}
        },
    )
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("TPU_RESULT "):
            res = json.loads(line[len("TPU_RESULT "):])
    assert res is not None, out.stdout[-2000:] + out.stderr[-2000:]

    import numpy as np

    e_pallas = np.asarray(res["pallas"])
    e_xla = np.asarray(res["xla"])
    assert np.all(np.isfinite(e_pallas)) and np.all(np.isfinite(e_xla))
    # the fused kernel and the stock XLA inner loop must track each other
    # on-device (same math, different fusion; f32 roundoff only)
    np.testing.assert_allclose(e_pallas, e_xla, rtol=5e-4, atol=1e-6)

    # f32-TPU vs f64-CPU trajectory: recompute the same lane on CPU f64
    # in-process (the suite's pinned platform) and compare within the
    # recorded probe tolerance
    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build

    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(
        {
            "tilt_solve_mode": "coupled", "tilt_step_size": 0.15,
            "tilt_inner_steps": 40, "tilt_tol": 1e-10,
            "step_size": 0.005, "step_size_mode": "fixed",
        }
    )
    mn = Minimizer(mesh, quiet=True)
    mn.step_size = 0.005
    e_cpu = []
    for _ in range(10):
        mn.minimize(1)
        e_cpu.append(float(mn.compute_energy()))
    e_cpu = np.asarray(e_cpu)
    rel = np.abs(e_pallas - e_cpu) / np.maximum(np.abs(e_cpu), 1e-9)
    assert rel.max() < 5e-3, f"f32-TPU vs f64-CPU trajectory drift {rel.max():.2e}"

    # auto-placement: the small lane must have landed on XLA:CPU and its
    # f32 trajectory must track the pinned-TPU one at the f32 level
    assert res["auto_platform"] == "cpu", res["auto_platform"]
    rel3 = abs(res["auto_e3"] - e_pallas[2]) / max(abs(e_pallas[2]), 1e-9)
    assert rel3 < 5e-3, f"auto-placement trajectory drift {rel3:.2e}"
