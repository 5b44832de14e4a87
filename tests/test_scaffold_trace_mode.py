"""physical_edge scaffold-trace lane vs recorded reference results.

The fixture (tools/record_scaffold_fixture.py) runs the reference's
scaffold-lane constraint surface on the scaffold_gapfill release fixture
(parity_trace_layer_radius set, parity_outer_shells=3):

- ``enforce_tilt_constraint``: outer-shell tilt targets with theta taken
  from the disk-ring directors (scalar theta targeting disabled on
  scaffold lanes, reference rim_slope_match_params.py:102-110);
- ``enforce_constraint``: trace-shell height + outer radial tilt
  projection, in both projector modes (proximal default and
  continuity_v2), with the ``preserve_trace_v1`` mesh-operation skip.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "scaffold_trace_reference.npz"
MESH_FIXTURE = Path(
    "/root/reference/tests/fixtures/"
    "kozlov_1disk_3d_free_disk_theory_parity_physical_edge_scaffold_gapfill_eps005_n3_release.yaml"
)


def _problem(projector="", mesh_op_mode="project"):
    import jax.numpy as jnp

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    fx = np.load(FIXTURE)
    mesh = parse_geometry(load_data(str(MESH_FIXTURE)))
    gp = mesh.global_parameters
    gp.set("rim_slope_match_scaffold_projector_mode", projector)
    gp.set("rim_slope_match_scaffold_mesh_operation_mode", mesh_op_mode)
    p = Minimizer(mesh, quiet=True).problem()
    vids = fx["vids"]
    ours_row = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([ours_row[int(v)] for v in vids])
    shape = np.asarray(p.state.positions).shape
    tin = np.zeros(shape)
    tout = np.zeros_like(tin)
    tin[perm] = fx["tin0"]
    tout[perm] = fx["tout0"]
    state = dataclasses.replace(
        p.state, tilts_in=jnp.asarray(tin), tilts_out=jnp.asarray(tout)
    )
    return p, state, fx, perm


@pytest.fixture(autouse=True)
def _need_fixture():
    if not FIXTURE.exists() or not MESH_FIXTURE.exists():
        pytest.skip("fixture not recorded")


def test_scaffold_spec_flags():
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, _state, _fx, _perm = _problem()
    sc = rim._spec_scaffold(p.spec)
    assert sc is not None
    scaffold, mesh_op_mode, _projector, has_trace = sc
    assert scaffold and has_trace
    assert not rim._spec_disk_targeting(p.spec), "scaffold disables disk targeting"
    has_disk, interp_outer, local_disk, theta_is_param = rim._spec_flags(p.spec)
    assert has_disk and local_disk and not interp_outer
    assert not theta_is_param, "scaffold lanes ignore the theta_B scalar param"
    assert rim._spec_staggered(p.spec)


def test_scaffold_tilt_enforce_matches_reference():
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, perm = _problem()
    enforce = rim.make_enforce_tilts(p.spec)
    out_state = enforce(state, p.topo, p.params)
    got_in = np.asarray(out_state.tilts_in)[perm]
    got_out = np.asarray(out_state.tilts_out)[perm]
    np.testing.assert_allclose(got_in, fx["tilt/tin1"], atol=1e-12, rtol=0)
    np.testing.assert_allclose(got_out, fx["tilt/tout1"], atol=1e-12, rtol=0)


@pytest.mark.parametrize(
    "tag,projector,mesh_op_mode,context",
    [
        ("proj_default", "", "project", "mesh_operation"),
        ("proj_v2", "continuity_v2", "project", "mesh_operation"),
        ("preserve", "continuity_v2", "preserve_trace_v1", "mesh_operation"),
        ("minimize_v2", "continuity_v2", "preserve_trace_v1", "minimize"),
    ],
)
def test_scaffold_height_projection_matches_reference(
    tag, projector, mesh_op_mode, context
):
    from membrane_solver_tpu.constraints import rim_slope_match_out as rim

    p, state, fx, perm = _problem(projector=projector, mesh_op_mode=mesh_op_mode)
    enforce = rim.make_enforce(p.spec)
    assert enforce is not None
    out_state = enforce(state, p.topo, p.params, context=context)
    got_pos = np.asarray(out_state.positions)[perm]
    got_tout = np.asarray(out_state.tilts_out)[perm]
    if bool(fx[f"{tag}/skipped"]):
        np.testing.assert_allclose(got_pos, fx["pos0"], atol=0, rtol=0)
        np.testing.assert_allclose(got_tout, fx["tout0"], atol=0, rtol=0)
    np.testing.assert_allclose(got_pos, fx[f"{tag}/pos1"], atol=1e-10, rtol=0)
    np.testing.assert_allclose(got_tout, fx[f"{tag}/tout1"], atol=1e-10, rtol=0)
