"""Frozen-geometry inner tilt solve must match the full per-iteration path.

The frozen program (runtime/tilt_relax.collect_frozen_tilt_program) bakes all
position-only fields once per relax call; since the tilt-dependent arithmetic
is identical, the relax trajectory must match the full path to float64
round-off.  Parity analog: the reference's cached-payload vs fresh-payload
equivalence (tilt_relaxation.py:562-585).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.runtime import tilt_relax


@pytest.fixture(scope="module")
def problem():
    mesh = parse_geometry(build("kozlov_1disk"))
    mesh.global_parameters.update(
        {
            "tilt_solve_mode": "coupled",
            "tilt_step_size": 0.15,
            "tilt_inner_steps": 12,
            "tilt_tol": 1e-10,
        }
    )
    mn = Minimizer(mesh, quiet=True)
    return mn.problem()


def test_frozen_program_exists_for_kozlov_lane(problem):
    prog = tilt_relax.collect_frozen_tilt_program(problem.spec)
    assert prog is not None, "kozlov lane modules must all support the frozen split"
    e_pre, e_fns, c_pre, c_fns, e_names = prog
    assert len(e_fns) >= 4  # tilt_in/out + bending_tilt_in/out (+ thetaB contact)
    assert len(c_fns) >= 1  # rim matching enforcement


def test_frozen_relax_matches_full_path(problem, monkeypatch):
    p = problem
    args = (
        p.state,
        p.topo,
        p.params,
        jnp.asarray(12, jnp.int32),
        jnp.asarray(0.15),
        jnp.asarray(1e-10),
    )

    relax_frozen = tilt_relax.make_relax_leaflet_tilts(p.spec)
    st_f, stats_f = relax_frozen(*args)

    monkeypatch.setenv("MEMBRANE_SOLVER_FROZEN_TILT", "0")
    relax_full = tilt_relax.make_relax_leaflet_tilts(p.spec)
    assert tilt_relax.collect_frozen_tilt_program(p.spec) is None
    st_o, stats_o = relax_full(*args)

    assert int(stats_f.accepted_steps) == int(stats_o.accepted_steps)
    np.testing.assert_allclose(
        float(stats_f.final_energy), float(stats_o.final_energy), rtol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(st_f.tilts_in), np.asarray(st_o.tilts_in), rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(st_f.tilts_out), np.asarray(st_o.tilts_out), rtol=1e-12, atol=1e-14
    )
