"""Unit lanes for the hand-rolled dense linear algebra (device/linalg.py).

These kernels back the KKT solves, the factor-once projector, the
pin-to-plane/circle fits (3x3 eigen), and the rigid-disk Kabsch transform;
each is checked against numpy on random instances.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu.device import linalg as dl


def _spd(n, seed=0, jitter=1.0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return M @ M.T + jitter * np.eye(n)


def test_cholesky_matches_numpy():
    A = _spd(7, seed=1)
    L = np.asarray(dl.cholesky(jnp.asarray(A)))
    assert np.allclose(L, np.linalg.cholesky(A), atol=1e-10)


def test_lower_upper_substitution():
    A = _spd(6, seed=2)
    L = np.linalg.cholesky(A)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(6)
    y = np.asarray(dl.solve_lower(jnp.asarray(L), jnp.asarray(b)))
    assert np.allclose(L @ y, b, atol=1e-10)
    x = np.asarray(dl.solve_upper(jnp.asarray(L.T), jnp.asarray(y)))
    assert np.allclose(A @ x, b, atol=1e-8)


def test_solve_gepp_matches_numpy_on_general_matrix():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((8, 8))
    b = rng.standard_normal(8)
    x = np.asarray(dl.solve_gepp(jnp.asarray(A), jnp.asarray(b)))
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-9)


def test_lu_factor_solve_roundtrip():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((9, 9))
    factors = dl.lu_factor(jnp.asarray(A))
    for seed in (6, 7):
        b = np.random.default_rng(seed).standard_normal(9)
        x = np.asarray(dl.lu_solve(factors, jnp.asarray(b)))
        assert np.allclose(A @ x, b, atol=1e-9)


def test_solve_spd_near_singular_regularized():
    # duplicated constraint rows make the Gram matrix semidefinite; with
    # the reference's regularization the solve must still go through
    A = _spd(5, seed=8, jitter=0.0)
    A[4] = A[3]  # exact duplicate row/col after symmetrization
    A[:, 4] = A[:, 3]
    A += 1e-10 * np.eye(5)
    b = np.random.default_rng(9).standard_normal(5)
    x = np.asarray(dl.solve_spd(jnp.asarray(A), jnp.asarray(b)))
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-5)


def test_gj_inverse_matches_numpy():
    rng = np.random.default_rng(10)
    A = rng.standard_normal((7, 7)) + 3 * np.eye(7)
    Ainv = np.asarray(dl.gj_inverse(jnp.asarray(A)))
    assert np.allclose(Ainv, np.linalg.inv(A), atol=1e-9)


def test_make_dense_solver_factor_once_apply_many():
    A = _spd(12, seed=11)
    apply = dl.make_dense_solver(jnp.asarray(A))
    for seed in (12, 13, 14):
        b = np.random.default_rng(seed).standard_normal(12)
        x = np.asarray(apply(jnp.asarray(b)))
        assert np.allclose(A @ x, b, atol=1e-8)


def test_eigh_3x3_matches_numpy():
    rng = np.random.default_rng(15)
    for _ in range(20):
        M = rng.standard_normal((3, 3))
        A = M + M.T
        evals, evecs = dl.eigh_3x3(jnp.asarray(A))
        evals, evecs = np.asarray(evals), np.asarray(evecs)
        ref = np.linalg.eigvalsh(A)
        assert np.allclose(evals, ref, atol=1e-8)
        for k in range(3):
            v = evecs[:, k]
            assert np.allclose(A @ v, evals[k] * v, atol=1e-6)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-8


def test_eigh_3x3_degenerate_pair():
    A = np.diag([2.0, 2.0, 5.0])  # repeated smallest pair
    evals, evecs = dl.eigh_3x3(jnp.asarray(A))
    assert np.allclose(np.asarray(evals), [2.0, 2.0, 5.0])
    v2 = np.asarray(evecs)[:, 2]
    assert np.allclose(np.abs(v2), [0, 0, 1], atol=1e-10)


def test_smallest_eigvec_is_plane_normal():
    # points scattered in the z=0 plane: smallest eigenvector of the
    # covariance is the plane normal (the pin_to_plane fit path)
    rng = np.random.default_rng(16)
    pts = rng.standard_normal((40, 3))
    pts[:, 2] = 0.0
    C = (pts - pts.mean(0)).T @ (pts - pts.mean(0))
    v = np.asarray(dl.smallest_eigvec_3x3(jnp.asarray(C)))
    assert np.allclose(np.abs(v), [0, 0, 1], atol=1e-10)


def test_kabsch_recovers_rotation_and_translation():
    rng = np.random.default_rng(17)
    # random proper rotation via QR
    Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    t = rng.standard_normal(3)
    P = rng.standard_normal((15, 3))
    target = P @ Q.T + t
    R, trans = dl.kabsch(jnp.asarray(P), jnp.asarray(target))
    R, trans = np.asarray(R), np.asarray(trans)
    assert np.allclose(R, Q, atol=1e-7)
    assert np.allclose(P @ R.T + trans, target, atol=1e-7)
    assert abs(np.linalg.det(R) - 1.0) < 1e-9


def test_kabsch_reflection_corrected_to_proper_rotation():
    # target is a mirror image: the lsq rigid transform must stay a PROPER
    # rotation (det +1), matching the reference's det correction
    rng = np.random.default_rng(18)
    P = rng.standard_normal((10, 3))
    target = P * np.array([1.0, 1.0, -1.0])
    R, trans = dl.kabsch(jnp.asarray(P), jnp.asarray(target))
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-9
