"""docs/PARAMETERS.md stays pinned to the code (the manual's key table).

The generator (tools/gen_gp_reference.py) scans the source for every
honored global-parameter/option key; this lane re-runs the scan and fails
when a key read by the code is missing from the generated document (or a
documented key vanished from the code), and when the commands documented
in docs/MANUAL.md drift from the registry.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PARAMS_DOC = REPO / "docs" / "PARAMETERS.md"
MANUAL = REPO / "docs" / "MANUAL.md"


def test_parameters_doc_covers_every_scanned_key():
    import tools.gen_gp_reference as gen

    gp, opt = gen.scan_keys()
    doc = PARAMS_DOC.read_text()
    missing = [k for k in sorted(gp) if f"`{k}`" not in doc]
    assert not missing, f"gp keys read by code but absent from PARAMETERS.md: {missing}"
    opt_missing = [k for k in sorted(opt) if f"`{k}`" not in doc]
    assert not opt_missing, f"option keys absent from PARAMETERS.md: {opt_missing}"


def test_generator_descriptions_not_stale():
    import tools.gen_gp_reference as gen

    gp, opt = gen.scan_keys()
    described = {k for sec in gen.GP_SECTIONS.values() for k in sec}
    stale = sorted(described - set(gp))
    assert not stale, f"described keys no longer read by code: {stale}"
    stale_opt = sorted(set(gen.OPT_DESCRIPTIONS) - set(opt))
    assert not stale_opt, f"described option keys no longer read: {stale_opt}"


def test_manual_documents_every_command():
    from membrane_solver_tpu.commands.registry import COMMAND_REGISTRY

    manual = MANUAL.read_text()
    # each registry entry (or an alias sharing its command object) appears
    by_obj: dict[type, list[str]] = {}
    for name, cmd in COMMAND_REGISTRY.items():
        by_obj.setdefault(type(cmd), []).append(name)
    undocumented = []
    for names in by_obj.values():
        if not any(re.search(rf"`{re.escape(n)}[`/ N<]", manual) or f"`{n}`" in manual
                   for n in names):
            undocumented.append(sorted(names))
    assert not undocumented, f"commands absent from MANUAL.md: {undocumented}"
