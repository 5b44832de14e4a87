#!/usr/bin/env python3
"""Record reference results for the ring_average_radial_v1 rim-matching mode.

Runs the MOUNTED reference's enforce_tilt_constraint, tilt constraint-row
builder, and shape constraint-row builder on the meshgen kozlov lane with
``rim_slope_match_mode: ring_average_radial_v1`` (both the equal-ring and
interpolated-outer variants), and stores the results in
tests/fixtures/ring_average_rim_reference.npz for
tests/test_ring_average_rim_mode.py.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("MEMBRANE_REFERENCE_ROOT", "/root/reference")
OUT = REPO / "tests" / "fixtures" / "ring_average_rim_reference.npz"

sys.path.insert(0, str(REPO))


def build_variant(interp: bool) -> dict:
    from membrane_solver_tpu.meshgen import build

    data = build("kozlov_1disk")
    data["global_parameters"]["rim_slope_match_mode"] = "ring_average_radial_v1"
    if interp:
        seen = 0
        for v in data["vertices"]:
            opts = v[-1] if isinstance(v[-1], dict) else None
            if opts and opts.get("preset") == "outer":
                if seen % 2 == 1:
                    opts.pop("preset")
                seen += 1
    return data


def seeded_tilts(n, seed):
    rng = np.random.default_rng(seed)
    return (
        0.05 * rng.standard_normal((n, 3)),
        0.05 * rng.standard_normal((n, 3)),
    )


def main() -> None:
    if not os.path.isdir(REF):
        print("reference not mounted; skipping")
        return
    sys.path.insert(0, REF)
    from geometry.geom_io import parse_geometry as rparse
    from modules.constraints import rim_slope_match_gradients as rg
    from modules.constraints import rim_slope_match_out as rmod

    out: dict = {}
    for name, interp in (("equal", False), ("interp", True)):
        data = build_variant(interp)
        mesh = rparse(json.loads(json.dumps(data)))
        mesh.build_position_cache()
        positions = mesh.positions_view()
        n = positions.shape[0]
        tin, tout = seeded_tilts(n, seed=23 if interp else 19)
        mesh.set_tilts_in_from_array(np.asarray(tin, order="F"))
        mesh.set_tilts_out_from_array(np.asarray(tout, order="F"))
        vids = np.asarray(mesh.vertex_ids, dtype=int)

        rmod.enforce_tilt_constraint(mesh, global_params=mesh.global_parameters)
        out[f"{name}/vids"] = vids
        out[f"{name}/tin0"] = tin
        out[f"{name}/tout0"] = tout
        out[f"{name}/tin1"] = np.asarray(mesh.tilts_in_view())
        out[f"{name}/tout1"] = np.asarray(mesh.tilts_out_view())

        # aggregated tilt rows (expected: ONE condition per leaflet family)
        mesh2 = rparse(json.loads(json.dumps(data)))
        mesh2.build_position_cache()
        rows = rg.constraint_gradients_tilt_rows_array(
            mesh2,
            mesh2.global_parameters,
            positions=mesh2.positions_view(),
            index_map=mesh2.vertex_index_to_row,
        )
        k = 0 if not rows else len(rows)
        gin = np.zeros((max(k, 1), n, 3))
        gout = np.zeros((max(k, 1), n, 3))
        for i, (in_part, out_part) in enumerate(rows or []):
            if in_part is not None:
                r, v = in_part
                np.add.at(gin[i], np.asarray(r, dtype=int), np.asarray(v, dtype=float))
            if out_part is not None:
                r, v = out_part
                np.add.at(gout[i], np.asarray(r, dtype=int), np.asarray(v, dtype=float))
        out[f"{name}/rows_k"] = np.asarray(k)
        out[f"{name}/rows_vids"] = np.asarray(mesh2.vertex_ids, dtype=int)
        out[f"{name}/rows_gin"] = gin
        out[f"{name}/rows_gout"] = gout

        # aggregated shape rows
        shape = rg.constraint_gradients_rows_array(
            mesh2,
            mesh2.global_parameters,
            positions=mesh2.positions_view(),
            index_map=mesh2.vertex_index_to_row,
        )
        ks = 0 if not shape else len(shape)
        gshape = np.zeros((max(ks, 1), n, 3))
        for i, (r, v) in enumerate(shape or []):
            np.add.at(gshape[i], np.asarray(r, dtype=int), np.asarray(v, dtype=float))
        out[f"{name}/shape_k"] = np.asarray(ks)
        out[f"{name}/shape_rows"] = gshape
        print(f"{name}: n={n} tilt_rows={k} shape_rows={ks}")

    np.savez_compressed(OUT, **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
