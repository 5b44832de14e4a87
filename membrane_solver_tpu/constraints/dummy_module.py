"""Test-fixture constraint module (parity: modules/constraints/dummy_module.py)."""

from __future__ import annotations


def enforce(state, topo, params, context: str = "minimize"):
    return state
