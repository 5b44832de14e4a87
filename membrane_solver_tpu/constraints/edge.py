"""Placeholder (empty in the reference: modules/constraints/edge.py)."""
