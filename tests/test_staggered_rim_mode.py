"""shared_rim_staggered_v1 rim matching vs recorded reference results.

The fixture (tools/record_staggered_fixture.py) runs the reference's
enforce_tilt_constraint and tilt constraint-row builder on two variants of
the meshgen kozlov lane in staggered mode:

- ``equal``: outer ring == rim ring size -> 1:1 pairing, exact parity.
- ``interp``: arc-length interpolation pairing (two target slots sharing
  rows between adjacent conditions).  The reference applies per-condition
  corrections sequentially (later conditions see earlier updates on shared
  rows); this solver replicates that order with a lax.scan, so both
  variants match to round-off.  The KKT rows are order-free in both.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "staggered_rim_reference.npz"


def _build_variant(interp: bool) -> dict:
    from membrane_solver_tpu.meshgen import build

    data = build("kozlov_1disk")
    data["global_parameters"]["rim_slope_match_mode"] = "shared_rim_staggered_v1"
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
    # map reference row order -> our row order by vertex id
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


@pytest.mark.parametrize("interp,tol", [(False, 1e-12), (True, 1e-12)])
def test_staggered_enforce_matches_reference(interp, tol):
    if not FIXTURE.exists():
        pytest.skip("fixture not recorded")
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, name, perm = _problem(interp)
    assert rim._spec_staggered(p.spec), "lane must compile in staggered mode"
    enforce = rim.make_enforce_tilts(p.spec)
    out_state = enforce(state, p.topo, p.params)
    got_in = np.asarray(out_state.tilts_in)[perm]
    got_out = np.asarray(out_state.tilts_out)[perm]
    np.testing.assert_allclose(got_in, fx[f"{name}/tin1"], atol=tol, rtol=0)
    np.testing.assert_allclose(got_out, fx[f"{name}/tout1"], atol=tol, rtol=0)


@pytest.mark.parametrize("interp", [False, True])
def test_staggered_tilt_rows_match_reference(interp):
    if not FIXTURE.exists():
        pytest.skip("fixture not recorded")
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, name, _perm = _problem(interp)
    rows_fn = rim.make_tilt_constraint_rows(p.spec)
    rows = rows_fn(state, p.topo, p.params)
    assert rows is not None
    got = np.asarray(rows)  # (K, 2=in/out, Nv, 3), ours: out block then in block

    rvids = fx[f"{name}/rows_vids"]
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in rvids])
    k_ref = int(fx[f"{name}/rows_k"])
    ref_gin = fx[f"{name}/rows_gin"]
    ref_gout = fx[f"{name}/rows_gout"]

    # the reference interleaves (out_i, in_i) per condition; ours stacks all
    # out rows then all in rows.  Match rows as sets: every nonzero
    # reference row must have an exact (1e-9) counterpart among ours.
    ours_out = got[:, 1][:, perm]
    ours_in = got[:, 0][:, perm]

    def assert_rows_match(ref_rows, ours_rows):
        ref_live = [r for r in ref_rows if np.abs(r).max() > 0]
        ours_live = [r for r in ours_rows if np.abs(r).max() > 0]
        assert len(ref_live) == len(ours_live)
        for r in ref_live:
            best = min(float(np.abs(o - r).max()) for o in ours_live)
            assert best < 1e-9, f"unmatched reference row (best diff {best})"

    assert_rows_match(ref_gout[:k_ref], ours_out)
    assert_rows_match(ref_gin[:k_ref], ours_in)
