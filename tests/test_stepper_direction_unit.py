"""Unit lanes for the functional stepper directions (jit_core).

Parity: reference runtime/steppers/{gradient_descent,conjugate_gradient,
bfgs}.py semantics — per-row Polak-Ribiere CG with beta<0 reset and the
10-step restart interval; dense BFGS inverse-Hessian update gated on the
curvature condition, identity reset otherwise; fixed rows pinned to zero.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.runtime import jit_core


def _mk(kind, n=4):
    ss = jit_core.fresh_stepper_state(n, kind=kind)
    fixed = jnp.zeros(n, bool)
    pos = jnp.zeros((n, 3), ss.prev_grad.dtype)
    return ss, fixed, pos


def test_gd_direction_is_negative_gradient():
    ss, fixed, pos = _mk("gradient_descent")
    g = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)))
    d, ss2 = jit_core.stepper_direction("gradient_descent", g, ss, fixed, pos)
    assert np.allclose(np.asarray(d), -np.asarray(g))
    assert ss2 is ss  # GD carries no state


def test_cg_first_step_is_steepest_descent():
    ss, fixed, pos = _mk("conjugate_gradient")
    g = jnp.asarray(np.random.default_rng(1).standard_normal((4, 3)))
    d, _ = jit_core.stepper_direction("conjugate_gradient", g, ss, fixed, pos)
    assert np.allclose(np.asarray(d), -np.asarray(g))


def test_cg_polak_ribiere_beta_and_negative_reset():
    rng = np.random.default_rng(2)
    g_prev = rng.standard_normal((4, 3))
    d_prev = rng.standard_normal((4, 3))
    g = rng.standard_normal((4, 3))
    ss, fixed, pos = _mk("conjugate_gradient")
    ss = dataclasses.replace(
        ss,
        prev_grad=jnp.asarray(g_prev),
        prev_dir=jnp.asarray(d_prev),
        have_prev=jnp.asarray(True),
        iter_count=jnp.asarray(3, jnp.int32),  # not a restart boundary
    )
    d, _ = jit_core.stepper_direction("conjugate_gradient", jnp.asarray(g), ss, fixed, pos)
    beta = np.sum(g * (g - g_prev), axis=1) / (np.sum(g_prev * g_prev, axis=1) + 1e-20)
    expected = -g + beta[:, None] * d_prev
    expected[beta < 0] = -g[beta < 0]
    assert np.allclose(np.asarray(d), expected)


def test_cg_restart_interval_resets_to_steepest():
    rng = np.random.default_rng(3)
    g = rng.standard_normal((4, 3))
    ss, fixed, pos = _mk("conjugate_gradient")
    ss = dataclasses.replace(
        ss,
        prev_grad=jnp.asarray(rng.standard_normal((4, 3))),
        prev_dir=jnp.asarray(rng.standard_normal((4, 3))),
        have_prev=jnp.asarray(True),
        iter_count=jnp.asarray(jit_core.CG_RESTART_INTERVAL, jnp.int32),
    )
    d, _ = jit_core.stepper_direction("conjugate_gradient", jnp.asarray(g), ss, fixed, pos)
    assert np.allclose(np.asarray(d), -g)


def test_cg_fixed_rows_zeroed():
    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.standard_normal((4, 3)))
    ss, _, pos = _mk("conjugate_gradient")
    fixed = jnp.asarray([True, False, False, True])
    d, _ = jit_core.stepper_direction("conjugate_gradient", g, ss, fixed, pos)
    d = np.asarray(d)
    assert np.all(d[0] == 0) and np.all(d[3] == 0)
    assert not np.all(d[1] == 0)


def test_bfgs_quadratic_converges_to_newton_direction():
    """On f(x) = 0.5 x^T A x with exact line searches, BFGS terminates in
    at most n steps; every direction along the way must be a descent
    direction (the curvature-gated update keeps H SPD)."""
    rng = np.random.default_rng(5)
    n = 2  # 6 DOF
    M = rng.standard_normal((6, 6))
    A = M @ M.T + 6 * np.eye(6)

    def grad_of(x):
        return (A @ x.reshape(-1)).reshape(n, 3)

    ss, fixed, _ = _mk("bfgs", n=n)
    x = rng.standard_normal((n, 3))
    for _ in range(8):
        g = grad_of(x)
        d, ss = jit_core.stepper_direction(
            "bfgs", jnp.asarray(g), ss, fixed, jnp.asarray(x)
        )
        d_np = np.asarray(d)
        assert float(np.sum(d_np * g)) < 0  # descent direction
        # exact line search on the quadratic
        denom = float(d_np.reshape(-1) @ A @ d_np.reshape(-1))
        alpha = -float(g.reshape(-1) @ d_np.reshape(-1)) / denom
        ss = jit_core.stepper_update_on_success(
            "bfgs", ss, jnp.asarray(g), d, jnp.asarray(x)
        )
        x = x + alpha * d_np
    # BFGS with exact line search terminates on a quadratic in <= n steps
    assert np.linalg.norm(grad_of(x)) < 1e-8 * np.linalg.norm(A)


def test_bfgs_curvature_failure_resets_to_identity():
    ss, fixed, _ = _mk("bfgs", n=2)
    g_prev = np.ones((2, 3))
    x_prev = np.zeros((2, 3))
    ss = dataclasses.replace(
        ss,
        prev_grad=jnp.asarray(g_prev),
        prev_x=jnp.asarray(x_prev),
        H=jnp.asarray(2.0 * np.eye(6)),
        have_prev=jnp.asarray(True),
        iter_count=jnp.asarray(1, jnp.int32),
    )
    # y.s = (g - g_prev).(x - x_prev) < 0: move along +g direction
    x = -np.ones((2, 3))
    g = 2.0 * np.ones((2, 3))
    d, ss2 = jit_core.stepper_direction(
        "bfgs", jnp.asarray(g), ss, fixed, jnp.asarray(x)
    )
    assert np.allclose(np.asarray(ss2.H), np.eye(6))  # reset on ys <= 1e-12
    assert np.allclose(np.asarray(d), -g)


def test_update_on_success_records_history():
    ss, fixed, pos = _mk("conjugate_gradient")
    g = jnp.ones((4, 3))
    d = -g
    ss2 = jit_core.stepper_update_on_success("conjugate_gradient", ss, g, d, pos)
    assert bool(ss2.have_prev)
    assert int(ss2.iter_count) == 1
    assert np.allclose(np.asarray(ss2.prev_grad), np.asarray(g))
    # GD is stateless
    ss3 = jit_core.stepper_update_on_success("gradient_descent", ss, g, d, pos)
    assert ss3 is ss
