"""Backend-dependent performance switches.

These pick between semantically identical execution strategies: results are
bit-identical per candidate; only scheduling changes.  CPU keeps the
sequential forms (fewer total energy evaluations, matching the reference's
NumPy trial loop); TPU prefers batched forms (one wide kernel instead of a
latency-bound chain of small dispatches inside ``lax.while_loop``).
"""

from __future__ import annotations

import os

import jax


def batched_line_search() -> bool:
    """Evaluate backtracking trial candidates as one vmapped batch.

    The candidate step sizes of a backtracking search are known upfront
    (a fixed halving/beta chain), so the accept decision — first candidate
    whose trial energy passes — can be computed from one batched evaluation.
    On TPU this collapses an up-to-10-deep chain of dependent small kernels
    into two (first candidate alone, then the tail batch when it rejects).
    Decisions and accepted states are identical to the sequential loop.
    """
    env = os.environ.get("MEMBRANE_SOLVER_BATCHED_LS")
    if env is not None:
        return env not in {"0", "false", "no"}
    from membrane_solver_tpu.utils.placement import effective_backend

    return effective_backend() != "cpu"
