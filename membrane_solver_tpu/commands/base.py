"""Command base class (parity: reference commands/base.py)."""

from __future__ import annotations


class Command:
    """A named REPL/instruction command."""

    help_text: str = ""

    def execute(self, context, args) -> None:  # pragma: no cover - interface
        raise NotImplementedError
