"""Padded-capacity pre-planning for instruction recipes.

The jitted minimize/relax blocks are traced per padded capacity; an
Evolver recipe like the cube's ``g50;r;u;V2;g50;r;u;V2;g100;...;g200``
grows the mesh through 3-4 capacities and therefore pays 3-4 full
trace+lower passes per process (~0.5-1 s each on this host — the dominant
cold-start cost; the XLA persistent cache only removes the *compile*).

When the full instruction list is known up front (CLI file recipes, suite
scenarios), the refinement growth is exactly predictable:

- ``r`` triangulates polygons with a centroid fan (k-gon -> k triangles,
  +1 vertex, +k edges; runtime/refinement.py:231) and then 1->4 subdivides
  every triangle (v' = v + e, e' = 2e + 3f, f' = 4f; refinement.py:351).

So the planner counts the refines in the recipe (macro-aware), forward-
simulates the counts, and returns capacity FLOORS.  ``Minimizer`` passes
them to ``compile_state`` so the whole recipe runs at its final padded
capacity: one trace per program instead of one per capacity epoch.
Padding a small early stage up to the final capacity costs only masked
rows (micro/milliseconds per step); a floor never *shrinks* a capacity,
and commands beyond the plan simply grow capacities as before.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

_MAX_MACRO_DEPTH = 8


def count_refines(
    instructions: Iterable[str],
    macros: Optional[dict] = None,
    _depth: int = 0,
) -> int:
    """Number of refinement passes a recipe will perform (``r``/``rN``/
    ``r N``, including one level set of macro expansions)."""
    macros = macros or {}
    total = 0
    for line in instructions or ():
        for part in str(line).split(";"):
            toks = part.strip().split()
            if not toks:
                continue
            name = toks[0]
            if name == "r":
                if len(toks) > 1 and toks[1].isdigit():
                    total += int(toks[1])
                else:
                    total += 1
            elif name.startswith("r") and name[1:].isdigit():
                total += int(name[1:])
            elif name in macros and _depth < _MAX_MACRO_DEPTH:
                body = macros[name]
                lines = [body] if isinstance(body, str) else list(body)
                total += count_refines(lines, macros, _depth + 1)
    return total


def capacity_floors(mesh, n_refines: int) -> Optional[Dict[str, int]]:
    """Predicted (nv, ne, nf) after ``n_refines`` passes, as cap floors."""
    if n_refines <= 0:
        return None
    v = len(mesh.vertices)
    e = len(mesh.edges)
    tris = 0
    poly_sizes = []
    for f in mesh.facets.values():
        k = len(f.edge_indices)
        if k == 3:
            tris += 1
        elif k > 3:
            poly_sizes.append(k)
    # centroid-fan triangulation happens inside the first refine
    v += len(poly_sizes)
    e += sum(poly_sizes)
    f = tris + sum(poly_sizes)
    for _ in range(n_refines):
        v, e, f = v + e, 2 * e + 3 * f, 4 * f
    return {"nv": v, "ne": e, "nf": f}


def plan_for_instructions(mesh, instructions: Iterable[str]) -> Optional[Dict[str, int]]:
    """Capacity floors for a known-up-front recipe (None when no refines)."""
    return capacity_floors(
        mesh, count_refines(instructions, getattr(mesh, "macros", None))
    )
