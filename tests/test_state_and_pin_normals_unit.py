"""Direct unit lanes: device/state host bridge (writeback, static-option
collection) and the pin-constraint local-normal channels that feed
jit_core's per-vertex KKT projector.

Parity: reference geometry/mesh.py SoA writeback, runtime/
constraint_projection.py local rows (pin_to_circle / pin_to_plane).
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.core.parameters import GlobalParameters
from membrane_solver_tpu.device.state import collect_static_options, writeback
from membrane_solver_tpu.meshgen import build


def test_writeback_copies_device_state_to_host_mesh():
    import dataclasses

    import jax.numpy as jnp

    mn = Minimizer(parse_geometry(build("cube")), quiet=True)
    p = mn.problem()
    shifted = dataclasses.replace(p.state, positions=p.state.positions + 0.25)
    p.state = shifted
    writeback(p, mn.mesh)
    pos = np.asarray(shifted.positions)
    for i, vid in enumerate(p.vertex_ids):
        assert np.allclose(mn.mesh.vertices[int(vid)].position, pos[i])


def test_collect_static_options_picks_up_declared_and_derived_keys():
    gp = GlobalParameters(
        {
            "tilt_solve_mode": "coupled",
            "tilt_axisymmetric_about_thetaB_center": True,
        }
    )
    opts = dict(collect_static_options(gp))
    assert opts.get("tilt_solve_mode") == "coupled"
    # derived switch key, not a raw gp passthrough
    assert opts.get("tilt_axisym") == "on"
    # unset keys are absent (no None placeholders leak into the spec key)
    assert "benchmark_geometry_lane" not in opts


def test_pin_to_circle_local_normals_are_orthonormal_pairs():
    """Rim-pinned vertices get a (plane normal, radial) orthonormal pair;
    unpinned rows stay exactly zero so the local projector is a no-op there."""
    from membrane_solver_tpu.constraints import pin_to_circle

    mn = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True)
    p = mn.problem()
    out = pin_to_circle.local_constraint_normals(p.state, p.topo, p.params)
    assert out is not None
    arr = np.asarray(out)
    assert arr.shape == (p.state.positions.shape[0], 2, 3)
    norms = np.linalg.norm(arr, axis=2)  # (Nv, 2)
    pinned = norms[:, 0] > 1e-9
    assert pinned.any(), "kozlov rim must produce pinned rows"
    # pinned rows: both directions unit and mutually orthogonal
    dots = np.einsum("vc,vc->v", arr[pinned, 0], arr[pinned, 1])
    assert np.allclose(norms[pinned], 1.0, atol=1e-10)
    assert np.allclose(dots, 0.0, atol=1e-10)
    # unpinned rows exactly zero
    assert np.allclose(arr[~pinned], 0.0)


def test_local_projection_with_pin_normals_freezes_pinned_components():
    """Projecting a gradient through the orthonormalized pin normals kills
    exactly the (plane, radial) motion of pinned vertices and nothing else."""
    import jax.numpy as jnp

    from membrane_solver_tpu.constraints import pin_to_circle
    from membrane_solver_tpu.runtime import jit_core

    mn = Minimizer(parse_geometry(build("kozlov_1disk")), quiet=True)
    p = mn.problem()
    normals = pin_to_circle.local_constraint_normals(p.state, p.topo, p.params)
    q = jit_core.orthonormalize_local_normals(normals)
    rng = np.random.default_rng(5)
    vec = jnp.asarray(rng.normal(size=p.state.positions.shape))
    out = np.asarray(jit_core.apply_local_projection(vec, q))
    qn = np.asarray(q)
    resid = np.einsum("vc,vmc->vm", out, qn)
    assert np.allclose(resid, 0.0, atol=1e-12)
    free = np.linalg.norm(qn, axis=(1, 2)) < 1e-12
    assert np.allclose(out[free], np.asarray(vec)[free])
