"""Fused frozen-tilt Pallas kernel parity (VERDICT round-1 item: Pallas in
the hot path with an e2e check).

Interpreter mode on CPU at f32: (1) kernel forward/backward vs the pure-jnp
oracle with identical arithmetic, (2) a full leaflet tilt relaxation on the
kozlov 1-disk lane with the fused kernel vs the stock XLA frozen path —
same accepted steps, energies to f32 reduction-order tolerance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from membrane_solver_tpu.pallas_kernels.frozen_tilt import (
    fused_tilt_energy,
    reference_energy,
)


def _random_inputs(T=301, seed=7):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    tin = jnp.asarray(rng.standard_normal((T, 3, 3)), f32)
    tout = jnp.asarray(rng.standard_normal((T, 3, 3)), f32)
    g = jnp.asarray(rng.standard_normal((T, 3, 3)), f32)
    pay = jnp.asarray(np.abs(rng.standard_normal((T, 20))), f32)
    k = jnp.asarray(rng.uniform(0.5, 2.0, 6), f32)
    return tin, tout, g, pay, k


def test_fused_kernel_energy_matches_oracle(monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PALLAS", "1")
    tin, tout, g, pay, k = _random_inputs()
    e_kernel = float(fused_tilt_energy(tin, tout, g, pay, k))
    e_oracle = float(reference_energy(tin, tout, g, pay, k))
    assert e_kernel == pytest.approx(e_oracle, rel=1e-6)


def test_fused_kernel_gradient_matches_oracle(monkeypatch):
    """Analytic backward kernel vs AD of the oracle (f32 reduction order)."""
    monkeypatch.setenv("MEMBRANE_SOLVER_PALLAS", "1")
    tin, tout, g, pay, k = _random_inputs(seed=13)
    gk = jax.grad(lambda a, b: fused_tilt_energy(a, b, g, pay, k), argnums=(0, 1))(
        tin, tout
    )
    go = jax.grad(lambda a, b: reference_energy(a, b, g, pay, k), argnums=(0, 1))(
        tin, tout
    )
    for a, b in zip(gk, go):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) <= 5e-6 * scale


def _kozlov_problem_f32():
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    path = (
        "/root/reference/benchmarks/inputs/"
        "bench_kozlov_1disk_profile_hard_rim_R12.yaml"
    )
    mesh = parse_geometry(load_data(path))
    mesh.global_parameters.update(
        {"tilt_solve_mode": "coupled", "tilt_step_size": 0.15, "tilt_tol": 0.0}
    )
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    from membrane_solver_tpu.runtime.minimizer import build_params

    params = {
        k: jnp.asarray(v, jnp.float32) if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v
        for k, v in build_params(mn.mesh).items()
    }
    f32 = jnp.float32
    state = dataclasses.replace(
        p.state,
        positions=p.state.positions.astype(f32),
        tilts_in=p.state.tilts_in.astype(f32),
        tilts_out=p.state.tilts_out.astype(f32),
        tilts=p.state.tilts.astype(f32),
    )
    return p.spec, state, p.topo, params


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference").exists(),
    reason="reference inputs not mounted",
)
def test_fused_relax_matches_stock_e2e(monkeypatch):
    """Full inner relax: fused Pallas path vs stock XLA frozen path."""
    from membrane_solver_tpu.runtime import tilt_relax as tr

    spec, state, topo, params = _kozlov_problem_f32()
    relax = tr.make_relax_leaflet_tilts(spec)
    iters = jnp.asarray(6, jnp.int32)
    step = jnp.asarray(0.15, jnp.float32)
    tol = jnp.asarray(0.0, jnp.float32)

    monkeypatch.setenv("MEMBRANE_SOLVER_PALLAS", "0")
    s0, st0 = relax(state, topo, params, iters, step, tol)
    monkeypatch.setenv("MEMBRANE_SOLVER_PALLAS", "1")
    # sanity: the fused path must actually engage on this lane
    e_names = tr.collect_frozen_tilt_program(spec)[4]
    assert set(tr._FUSED_NAMES) <= set(e_names)
    s1, st1 = relax(state, topo, params, iters, step, tol)

    assert int(st1.accepted_steps) == int(st0.accepted_steps)
    assert float(st1.final_energy) == pytest.approx(
        float(st0.final_energy), rel=5e-5
    )
    scale = float(jnp.max(jnp.abs(s0.tilts_in))) or 1.0
    assert float(jnp.max(jnp.abs(s1.tilts_in - s0.tilts_in))) <= 5e-4 * scale
    assert float(jnp.max(jnp.abs(s1.tilts_out - s0.tilts_out))) <= 5e-4 * scale
