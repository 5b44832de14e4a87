#!/usr/bin/env python3
"""Record reference results for the physical-edge scaffold-trace lane.

On the scaffold_gapfill release fixture (parity_trace_layer_radius set,
parity_outer_shells=3), runs the MOUNTED reference's

- ``enforce_tilt_constraint`` (scaffold flavor: outer-shell targets, theta
  from the disk-ring directors, no disk-theta targeting), and
- ``enforce_constraint`` (trace-shell height + outer-tilt projection) in
  the mesh_operation context for both projector modes (default proximal
  and ``continuity_v2``) plus the ``preserve_trace_v1`` skip,

and stores positions/tilts before/after in
tests/fixtures/scaffold_trace_reference.npz for
tests/test_scaffold_trace_mode.py.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("MEMBRANE_REFERENCE_ROOT", "/root/reference")
FIXTURE = (
    Path(REF)
    / "tests"
    / "fixtures"
    / "kozlov_1disk_3d_free_disk_theory_parity_physical_edge_scaffold_gapfill_eps005_n3_release.yaml"
)
OUT = REPO / "tests" / "fixtures" / "scaffold_trace_reference.npz"

sys.path.insert(0, str(REPO))


def seeded_tilts(n, seed):
    rng = np.random.default_rng(seed)
    return (
        0.05 * rng.standard_normal((n, 3)),
        0.05 * rng.standard_normal((n, 3)),
    )


def fresh_mesh():
    from geometry.geom_io import load_data, parse_geometry

    mesh = parse_geometry(load_data(str(FIXTURE)))
    mesh.build_position_cache()
    n = mesh.positions_view().shape[0]
    tin, tout = seeded_tilts(n, seed=31)
    mesh.set_tilts_in_from_array(np.asarray(tin, order="F"))
    mesh.set_tilts_out_from_array(np.asarray(tout, order="F"))
    return mesh, tin, tout


def main() -> None:
    if not os.path.isdir(REF):
        print("reference not mounted; skipping")
        return
    sys.path.insert(0, REF)
    from modules.constraints import rim_slope_match_out as rmod

    out: dict = {}

    # tilt enforcement (scaffold flavor)
    mesh, tin, tout = fresh_mesh()
    out["vids"] = np.asarray(mesh.vertex_ids, dtype=int)
    out["pos0"] = np.asarray(mesh.positions_view()).copy()
    out["tin0"] = tin
    out["tout0"] = tout
    rmod.enforce_tilt_constraint(mesh, global_params=mesh.global_parameters)
    out["tilt/tin1"] = np.asarray(mesh.tilts_in_view())
    out["tilt/tout1"] = np.asarray(mesh.tilts_out_view())

    # height projection per projector mode and context
    for tag, projector, mesh_op_mode, context in (
        ("proj_default", "", "project", "mesh_operation"),
        ("proj_v2", "continuity_v2", "project", "mesh_operation"),
        ("preserve", "continuity_v2", "preserve_trace_v1", "mesh_operation"),
        ("minimize_v2", "continuity_v2", "preserve_trace_v1", "minimize"),
    ):
        mesh, tin, tout = fresh_mesh()
        gp = mesh.global_parameters
        gp.set("rim_slope_match_scaffold_projector_mode", projector)
        gp.set("rim_slope_match_scaffold_mesh_operation_mode", mesh_op_mode)
        rmod.enforce_constraint(mesh, global_params=gp, context=context)
        out[f"{tag}/pos1"] = np.asarray(mesh.positions_view())
        out[f"{tag}/tout1"] = np.asarray(mesh.tilts_out_view())
        stats = getattr(
            mesh, "_last_rim_slope_match_scaffold_mesh_operation_stats", {}
        )
        out[f"{tag}/skipped"] = np.asarray(bool(stats.get("skipped", False)))
        print(tag, "skipped:", bool(stats.get("skipped", False)))

    np.savez_compressed(OUT, **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
