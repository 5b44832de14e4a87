"""CLI tab-completion helpers (reference tests/test_cli_completion.py)."""

from __future__ import annotations

from membrane_solver_tpu.commands.completion import (
    command_line_completions,
    command_name_completions,
)


def test_command_name_completion_uses_last_semicolon_segment():
    candidates = command_name_completions(
        text="t",
        line_buffer="g10; t",
        command_names=["g", "t", "tf", "tilt_stats"],
        macro_names=[],
    )
    assert "t" in candidates
    assert "tf" in candidates
    assert "tilt_stats" in candidates


def test_command_name_completion_does_not_complete_args():
    candidates = command_name_completions(
        text="x",
        line_buffer="set vertex 0 x",
        command_names=["set", "save"],
        macro_names=[],
    )
    assert candidates == []


def test_command_name_completion_includes_macros():
    candidates = command_name_completions(
        text="go",
        line_buffer="go",
        command_names=["g"],
        macro_names=["gogo"],
    )
    assert candidates == ["gogo"]


def test_energy_subcommand_completion():
    candidates = command_line_completions(
        text="",
        line_buffer="energy ",
        command_names=["energy", "set"],
        macro_names=[],
    )
    assert "breakdown" in candidates
    assert "curvature" in candidates
    assert "total" in candidates
    assert "ref" in candidates


def test_energy_subcommand_completion_prefix():
    candidates = command_line_completions(
        text="c",
        line_buffer="energy c",
        command_names=["energy", "set"],
        macro_names=[],
    )
    assert candidates == ["curvature"]


def test_non_energy_args_get_no_completions():
    candidates = command_line_completions(
        text="",
        line_buffer="set ",
        command_names=["energy", "set"],
        macro_names=[],
    )
    assert candidates == []


def test_empty_buffer_lists_all_commands():
    candidates = command_line_completions(
        text="",
        line_buffer="",
        command_names=["g", "r"],
        macro_names=["m1"],
    )
    assert candidates == ["g", "m1", "r"]
