"""Global scalar theta_B optimization by reduced-energy sampling.

Parity: reference ``runtime/tilt_optimization.py:_optimize_thetaB_scalar`` —
every ``tilt_thetaB_optimize_every`` iterations, evaluate the total energy
after a short (``tilt_thetaB_optimize_inner_steps``) leaflet-tilt relaxation
for theta_B in {base, base - delta, base + delta}; keep the argmin (tilts
included), roll back fully if no candidate beats the base energy, and guard
against divergent candidates with the tilt energy-spike threshold.  Scan
records append to ``mesh._thetaB_scan_trace`` for diagnostics.

Runs on the host between jitted minimize chunks; each candidate evaluation
is one call into the jitted relax + energy programs.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def thetaB_scan_due(minimizer, iteration: int) -> bool:
    gp = minimizer.global_params
    mode_match = str(gp.get("rim_slope_match_mode") or "").strip().lower()
    trace_radius = gp.get("parity_trace_layer_radius")
    outer_shells = int(gp.get("parity_outer_shells", 0) or 0)
    if (
        mode_match == "physical_edge_staggered_v1"
        and trace_radius is not None
        and outer_shells > 0
    ):
        return False  # scaffold trace lanes skip the scan (reference:15-40)
    if not bool(gp.get("tilt_thetaB_optimize", False)):
        return False
    every = int(gp.get("tilt_thetaB_optimize_every", 10) or 10)
    every = max(every, 1)
    return int(iteration) % every == 0


def optimize_thetaB_scalar(minimizer, *, tilt_mode: str, iteration: int) -> None:
    """Coordinate-descent update of gp['tilt_thetaB_value'] (see module doc)."""
    from membrane_solver_tpu.device.state import build_params
    from membrane_solver_tpu.runtime import jit_core
    from membrane_solver_tpu.runtime import tilt_relax as _tr

    gp = minimizer.global_params
    if not thetaB_scan_due(minimizer, iteration):
        return
    delta = float(gp.get("tilt_thetaB_optimize_delta", 0.02) or 0.0)
    if delta <= 0.0:
        return

    p = minimizer.problem()
    if not _tr.spec_uses_leaflet_tilts(p.spec):
        return
    relax = _tr.make_relax_leaflet_tilts(p.spec)
    energy_fn = jit_core.make_energy_value(p.spec)

    base_theta = float(gp.get("tilt_thetaB_value") or 0.0)
    base_state = p.state
    params = build_params(minimizer.mesh)

    # The reference scan temporarily sets tilt_inner_steps=scan_steps and
    # calls the stock relax, which derives its budget as: nested ->
    # tilt_inner_steps, coupled -> tilt_coupled_steps (fallback
    # tilt_inner_steps); and for the CG solver tilt_cg_max_iters OVERRIDES
    # that count entirely (reference tilt_relaxation.py:263-283).  On lanes
    # that pin tilt_cg_max_iters (the theory-parity interface fixtures set
    # 120) the "60-step probe" therefore actually runs 120 CG iterations.
    scan_steps = max(int(gp.get("tilt_thetaB_optimize_inner_steps", 20) or 20), 1)
    if str(tilt_mode).strip().lower() != "nested":
        scan_steps = int(gp.get("tilt_coupled_steps", scan_steps) or scan_steps)
    if str(gp.get("tilt_solver", "cg") or "cg").strip().lower() == "cg":
        scan_steps = int(gp.get("tilt_cg_max_iters", scan_steps) or scan_steps)
    scan_steps = max(scan_steps, 1)
    t_step = params.get("tilt_step_size", jnp.asarray(0.0))
    t_tol = params.get("tilt_tol", jnp.asarray(0.0))
    guard_factor = float(gp.get("tilt_relax_energy_guard_factor", 0.0) or 0.0)
    guard_min = float(gp.get("tilt_relax_energy_guard_min", 1e-4) or 1e-4)

    _bd = jit_core.make_energy_breakdown(p.spec)

    # Async-dispatch ALL candidate programs before fetching any result:
    # JAX dispatch is asynchronous, so the theta- and theta+ relaxes (the
    # scan's dominant cost — scan_steps CG iterations each) plus their
    # energy/breakdown programs overlap on the backend instead of being
    # serialized by per-candidate float() syncs.  Numerically identical to
    # the sequential evaluation — the programs themselves are unchanged;
    # measured ~25% off the kozlov_free_disk_light lane's warm time.
    import jax

    def dispatch_candidate(theta):
        cand_params = dict(params)
        cand_params["tilt_thetaB_value"] = jnp.asarray(
            theta, base_state.positions.dtype
        )
        st, _stats = relax(
            base_state, p.topo, cand_params, jnp.asarray(scan_steps, jnp.int32),
            t_step, t_tol,
        )
        return st, energy_fn(st, p.topo, cand_params), _bd(st, p.topo, cand_params)

    e0_dev = energy_fn(base_state, p.topo, params)
    bd0_dev = _bd(base_state, p.topo, params)
    st_minus, em_dev, bdm_dev = dispatch_candidate(base_theta - delta)
    st_plus, ep_dev, bdp_dev = dispatch_candidate(base_theta + delta)

    # one synchronization point for the whole scan
    e0, e_minus, e_plus, bd0, bdm, bdp = jax.device_get(
        (e0_dev, em_dev, ep_dev, bd0_dev, bdm_dev, bdp_dev)
    )
    e0, e_minus, e_plus = float(e0), float(e_minus), float(e_plus)

    record = {
        "iteration": int(iteration),
        "status": "evaluated",
        "base_thetaB": base_theta,
        "selected_thetaB": base_theta,
        "candidate_energies": [
            dict(
                {"thetaB": base_theta, "energy": e0, "discarded": False},
                **{k: float(v) for k, v in bd0.items()},
            )
        ],
    }

    def admit(theta, e, st, bd):
        """Guard + scan record (reference records a full breakdown per
        candidate, tilt_optimization.py:92)."""
        discarded = guard_factor > 0.0 and e > max(guard_min, abs(e0) * guard_factor)
        record["candidate_energies"].append(
            dict(
                {"thetaB": float(theta), "energy": e, "discarded": bool(discarded)},
                **{k: float(v) for k, v in bd.items()},
            )
        )
        return (float("inf"), base_state) if discarded else (e, st)

    e_minus, st_minus = admit(base_theta - delta, e_minus, st_minus, bdm)
    e_plus, st_plus = admit(base_theta + delta, e_plus, st_plus, bdp)

    best_e, best_theta, best_state = min(
        [
            (e0, base_theta, base_state),
            (e_minus, base_theta - delta, st_minus),
            (e_plus, base_theta + delta, st_plus),
        ],
        key=lambda x: x[0],
    )
    if best_e > e0:
        record["status"] = "rollback"
    else:
        gp.set("tilt_thetaB_value", float(best_theta))
        record["selected_thetaB"] = float(best_theta)
        p.state = dataclasses.replace(
            base_state, tilts_in=best_state.tilts_in, tilts_out=best_state.tilts_out
        )
        p.params = build_params(minimizer.mesh)

    traces = getattr(minimizer.mesh, "_thetaB_scan_trace", None)
    if traces is None:
        traces = []
        setattr(minimizer.mesh, "_thetaB_scan_trace", traces)
    traces.append(record)
