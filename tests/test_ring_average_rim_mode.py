"""ring_average_radial_v1 rim matching vs recorded reference results.

The fixture (tools/record_ring_average_fixture.py) runs the reference's
enforce_tilt_constraint and constraint-row builders on the meshgen kozlov
lane with ``rim_slope_match_mode: ring_average_radial_v1``: every
per-ring-vertex matching condition is aggregated into ONE constraint per
leaflet family (reference rim_slope_match_gradients.py:123-178), and the
geometric tilt enforcement applies one arc-weighted average correction to
the whole ring (reference rim_slope_match_out.py:104-199).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "ring_average_rim_reference.npz"


def _build_variant(interp: bool) -> dict:
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


def _problem(interp: bool):
    import dataclasses

    import jax.numpy as jnp

    from membrane_solver_tpu import Minimizer, parse_geometry

    fx = np.load(FIXTURE)
    name = "interp" if interp else "equal"
    data = _build_variant(interp)
    mesh = parse_geometry(json.loads(json.dumps(data)))
    p = Minimizer(mesh, quiet=True).problem()
    vids = fx[f"{name}/vids"]
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in vids])
    tin = np.zeros(np.asarray(p.state.positions).shape)
    tout = np.zeros_like(tin)
    tin[perm] = fx[f"{name}/tin0"]
    tout[perm] = fx[f"{name}/tout0"]
    state = dataclasses.replace(
        p.state, tilts_in=jnp.asarray(tin), tilts_out=jnp.asarray(tout)
    )
    return p, state, fx, name, perm


@pytest.mark.parametrize("interp", [False, True])
def test_ring_average_enforce_matches_reference(interp):
    if not FIXTURE.exists():
        pytest.skip("fixture not recorded")
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, name, perm = _problem(interp)
    assert rim._spec_ring_average(p.spec), "lane must compile in ring-average mode"
    assert not rim._spec_staggered(p.spec)
    enforce = rim.make_enforce_tilts(p.spec)
    out_state = enforce(state, p.topo, p.params)
    got_in = np.asarray(out_state.tilts_in)[perm]
    got_out = np.asarray(out_state.tilts_out)[perm]
    np.testing.assert_allclose(got_in, fx[f"{name}/tin1"], atol=1e-12, rtol=0)
    np.testing.assert_allclose(got_out, fx[f"{name}/tout1"], atol=1e-12, rtol=0)


@pytest.mark.parametrize("interp", [False, True])
def test_ring_average_tilt_rows_aggregate_and_match(interp):
    if not FIXTURE.exists():
        pytest.skip("fixture not recorded")
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, name, _perm = _problem(interp)
    rows_fn = rim.make_tilt_constraint_rows(p.spec)
    rows = rows_fn(state, p.topo, p.params)
    assert rows is not None
    got = np.asarray(rows)  # (K, 2=in/out, Nv, 3)

    rvids = fx[f"{name}/rows_vids"]
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in rvids])
    k_ref = int(fx[f"{name}/rows_k"])
    ref_gin = fx[f"{name}/rows_gin"][:k_ref]
    ref_gout = fx[f"{name}/rows_gout"][:k_ref]

    ours_out = got[:, 1][:, perm]
    ours_in = got[:, 0][:, perm]

    def live(rs):
        return [r for r in rs if np.abs(r).max() > 0]

    ref_live = live(ref_gin) + live(ref_gout)
    ours_live = live(ours_in) + live(ours_out)
    # aggregation: a handful of rows (one per family), not one per vertex
    assert len(ours_live) == len(ref_live)
    assert len(ours_live) <= 2
    for r in ref_live:
        best = min(float(np.abs(o - r).max()) for o in ours_live)
        assert best < 1e-9, f"unmatched reference aggregate row (diff {best})"


@pytest.mark.parametrize("interp", [False, True])
def test_ring_average_shape_rows_aggregate_and_match(interp):
    if not FIXTURE.exists():
        pytest.skip("fixture not recorded")
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, name, _perm = _problem(interp)
    fn = rim.make_constraint_gradient_rows(p.spec)
    got = fn(state, p.topo, p.params)
    assert got is not None
    got = np.asarray(got)  # (K, Nv, 3)
    assert got.shape[0] == 1, "ring average aggregates the shape family"

    rvids = fx[f"{name}/rows_vids"]
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in rvids])
    ours = got[:, perm]

    k_ref = int(fx[f"{name}/shape_k"])
    ref_rows = [
        r for r in fx[f"{name}/shape_rows"][:k_ref] if np.abs(r).max() > 0
    ]
    # the reference may stack the negated in-family aggregate too; ours keeps
    # the out aggregate only (span-preserving, see
    # make_constraint_gradient_rows) — every reference row must match ours
    # up to sign
    for r in ref_rows:
        best = min(
            min(float(np.abs(o - r).max()), float(np.abs(o + r).max()))
            for o in ours
        )
        assert best < 1e-9, f"unmatched reference shape aggregate (diff {best})"
