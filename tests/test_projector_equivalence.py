"""Three-channel KKT projector == full dense row stack.

make_gradient_projector splits constraint rows into local per-vertex
projectors, compact slot rows, and dense rows; this must produce the same
projection as stacking every module's dense rows into one KKT solve
(make_constraint_gradients + project_gradient_kkt), which is the
reference's formulation.  Checked on the kozlov lane (pins -> local, rim
-> compact) and the cap lane (volume -> dense, pins -> local).
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import build
from membrane_solver_tpu.runtime import jit_core


def _compare(problem, seed=0, tol=1e-9):
    p = problem
    rng = np.random.default_rng(seed)
    g = rng.standard_normal(np.asarray(p.state.positions).shape)
    g[~np.asarray(p.topo.vertex_valid)] = 0.0
    import jax.numpy as jnp

    g = jnp.asarray(g)

    project = jit_core.make_gradient_projector(p.spec)
    assert project is not None
    fast = np.asarray(project(g, p.state, p.topo, p.params))

    # ground truth: SVD-based orthogonal projection onto null(R) of the FULL
    # dense row stack.  (The duplicated rows that pins produce — plane row ==
    # circle plane row — make the regularized normal-equation solve itself
    # numerically fragile; the SVD projection is the clean formulation.)
    rows = jit_core.make_constraint_gradients(p.spec)(p.state, p.topo, p.params)
    assert rows is not None
    R = np.asarray(rows).reshape(rows.shape[0], -1)
    U, s, Vt = np.linalg.svd(R, full_matrices=False)
    rank = int(np.sum(s > 1e-10 * max(s.max(), 1e-30)))
    V = Vt[:rank]
    gflat = np.asarray(g).reshape(-1)
    dense = (gflat - V.T @ (V @ gflat)).reshape(fast.shape)

    scale = max(float(np.abs(dense).max()), 1.0)
    np.testing.assert_allclose(fast, dense, atol=tol * scale, rtol=0)

    # the projected gradient must annihilate every constraint row
    resid = R @ fast.reshape(-1)
    live = np.abs(R).sum(axis=1) > 0
    assert np.abs(resid[live]).max() < 1e-8 * scale


def test_kozlov_lane_projector_equivalence():
    mesh = parse_geometry(build("kozlov_1disk"))
    p = Minimizer(mesh, quiet=True).problem()
    _compare(p)


def test_cap_lane_projector_equivalence():
    mesh = parse_geometry(build("spherical_cap"))
    p = Minimizer(mesh, quiet=True).problem()
    _compare(p)


def test_mixed_compact_and_dense_channels():
    """A lane with rim matching (compact) AND a volume body (dense)."""
    data = build("kozlov_1disk")
    nf = len(data["faces"])
    data["bodies"] = {"faces": [list(range(nf))], "target_volume": [0.3]}
    data["constraint_modules"] = list(data["constraint_modules"]) + ["volume"]
    data["global_parameters"]["volume_constraint_mode"] = "lagrange"
    mesh = parse_geometry(data)
    p = Minimizer(mesh, quiet=True).problem()
    _compare(p)
