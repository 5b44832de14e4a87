#!/usr/bin/env python
"""Bisect the physical-edge step-0 accepted-energy deviation (~1e-6).

tools/trace_physical_edge_window.py showed the i50 window diverging from
the FIRST accepted trial (rel 1.05e-5) with no Armijo flip — so the
difference is in the per-trial evaluation chain, not the accept logic.
This tool isolates which link differs by exchanging the exact step-0
arrays between the solvers:

1. reference subprocess: run the i50 lane up to the first stepper.step
   call and dump (base positions, tilts_in/out, the projected gradient
   passed to the stepper, step_size_in, accepted trial energy, thetaB).
2. repo subprocess: load the SAME fixture, overwrite the device state
   with the reference's dumped base arrays, and compute on that identical
   state: total energy, the projected gradient, and the reduced-objective
   trial energy at alpha = step_size_in along -grad.
3. compare elementwise.

If the gradients match to ~1e-12, the deviation lives in the trial
pipeline (geometric/tilt enforcement or the 10-step reduced relax); if
they differ at ~1e-4..1e-6, the energy-gradient assembly itself differs
on this lane and the module-parity net has a hole.

Usage: python tools/compare_step0_gradient.py [i50_interface]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIXTURES = REF / "tests" / "fixtures"

_REF_CODE = """
import json, sys
import numpy as np
sys.path.insert(0, {ref!r})
from pathlib import Path
from tools.reproduce_theory_parity import (
    _build_context,
    _stabilize_rim_radius_for_parity,
    _activate_local_outer_shell_for_parity,
)
from commands.executor import execute_command_line

ctx = _build_context(Path({fixture!r}))
_stabilize_rim_radius_for_parity(ctx.mesh)
ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)

dump = {{}}
orig_step = ctx.minimizer.stepper.step

class Stop(Exception):
    pass

def recording_step(mesh, grad, step_size_in, energy_fn, **kw):
    trial_energies = []
    def wrapped_energy(*a, **k):
        e = energy_fn(*a, **k)
        trial_energies.append(float(e))
        return e
    tef = kw.get("trial_energy_fn")
    if tef is not None:
        def wrapped_tef(*a, **k):
            e = tef(*a, **k)
            trial_energies.append(float(e))
            return e
        kw = dict(kw, trial_energy_fn=wrapped_tef)
    base_positions = np.array(mesh.positions_view(), dtype=float)
    tin = np.array(mesh.tilts_in_view(), dtype=float)
    tout = np.array(mesh.tilts_out_view(), dtype=float)
    ok, new_step, E = orig_step(mesh, grad, step_size_in, wrapped_energy, **kw)
    np.savez(
        {npz!r},
        base_positions=base_positions,
        tilts_in=tin,
        tilts_out=tout,
        grad=np.asarray(grad, dtype=float),
        vertex_ids=np.array(sorted(mesh.vertices.keys()), dtype=np.int64),
    )
    dump["step_size_in"] = float(step_size_in)
    dump["accepted_E"] = float(E)
    dump["new_step"] = float(new_step)
    dump["n_trial_evals"] = len(trial_energies)
    dump["trial_energies"] = trial_energies
    dump["thetaB"] = float(ctx.mesh.global_parameters.get("tilt_thetaB_value"))
    raise Stop()

ctx.minimizer.stepper.step = recording_step
try:
    execute_command_line(ctx, "g1")
except Stop:
    pass
print("STEP0_DUMP " + json.dumps(dump))
"""

_REPO_CODE = """
import json, sys
import numpy as np
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import dataclasses
from pathlib import Path
from tools.reproduce_theory_parity import (
    build_context, stabilize_rim_radius, activate_physical_edge_bump,
)
from membrane_solver_tpu.runtime import jit_core
from membrane_solver_tpu.device.state import build_params

ref = np.load({npz!r})
meta = json.loads(Path({meta!r}).read_text())

ctx = build_context(Path({fixture!r}))
stabilize_rim_radius(ctx.mesh)
activate_physical_edge_bump(ctx.mesh)
# step 0 of the reference loop has already run relax + theta scan before
# stepper.step; mirror the host-side part (scan updates thetaB + tilts)
ctx.mesh.global_parameters.set("tilt_thetaB_value", meta["thetaB"])

mn = ctx.minimizer
p = mn.problem()
nv = ref["base_positions"].shape[0]

out = {{}}
# row alignment sanity: our first nv rows must be the same vertices
mine = np.asarray(p.state.positions)[:nv]
out["base_pos_max_abs_diff"] = float(np.max(np.abs(mine - ref["base_positions"])))

# overwrite the device state with the reference's exact base arrays
dtype = p.state.positions.dtype
def pad_like(arr, cur):
    buf = np.array(cur)
    buf[:nv] = arr
    return jnp.asarray(buf, dtype)

state = dataclasses.replace(
    p.state,
    positions=pad_like(ref["base_positions"], p.state.positions),
    tilts_in=pad_like(ref["tilts_in"], p.state.tilts_in),
    tilts_out=pad_like(ref["tilts_out"], p.state.tilts_out),
)
params = build_params(ctx.mesh)

energy_vg = jit_core.make_energy_vg(p.spec)
E, g = energy_vg(state.positions, state, p.topo, params)
out["E_at_base"] = float(E)
projector = jit_core.make_gradient_projector(p.spec)
if projector is not None:
    g = projector(g, state, p.topo, params)
g = jnp.where(p.topo.fixed_mask[:, None], 0.0, g)
gh = np.asarray(g)[:nv]
rg = ref["grad"]
out["grad_max_abs_diff"] = float(np.max(np.abs(gh - rg)))
out["grad_ref_max_abs"] = float(np.max(np.abs(rg)))
denom = np.maximum(np.abs(rg), 1e-12)
out["grad_max_rel_diff"] = float(np.max(np.abs(gh - rg) / denom))
i = int(np.argmax(np.abs(gh - rg)) // 3)
out["worst_row"] = i
out["worst_ref"] = [float(x) for x in rg[i]]
out["worst_mine"] = [float(x) for x in gh[i]]
print("REPO_CMP " + json.dumps(out))
"""


def _run(code: str, tag: str, timeout: int = 3600) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
    )
    for line in out.stdout.splitlines():
        if line.startswith(tag + " "):
            return json.loads(line[len(tag) + 1:])
    raise RuntimeError(
        f"{tag} subprocess failed (rc {out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("lane", nargs="?", default="i50_interface",
                    choices=["i50_interface", "i60_interface", "near_edge_v1"])
    args = ap.parse_args(argv)
    fixture = str(
        FIXTURES / f"kozlov_1disk_3d_free_disk_theory_parity_{args.lane}.yaml"
    )
    with tempfile.TemporaryDirectory() as td:
        npz = str(Path(td) / "step0.npz")
        meta_path = Path(td) / "meta.json"
        ref = _run(_REF_CODE.format(ref=str(REF), fixture=fixture, npz=npz),
                   "STEP0_DUMP")
        meta_path.write_text(json.dumps(ref))
        print("reference step 0:", json.dumps(ref, indent=1))
        cmp_ = _run(_REPO_CODE.format(
            repo=str(REPO), fixture=fixture, npz=npz, meta=str(meta_path)),
            "REPO_CMP")
        print("repo comparison:", json.dumps(cmp_, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
