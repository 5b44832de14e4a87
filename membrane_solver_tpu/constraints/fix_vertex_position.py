"""Placeholder for a constraint that fixes a vertex at a specified position.

Parity: reference ``modules/constraints/fix_vertex_position.py`` — an empty
placeholder there too; per-vertex fixing is expressed with the ``fixed``
flag, which the solver enforces via the fixed-row mask.
"""
