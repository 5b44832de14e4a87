from membrane_solver_tpu.commands.context import CommandContext
from membrane_solver_tpu.commands.executor import execute_command_line
from membrane_solver_tpu.commands.registry import COMMAND_REGISTRY, get_command

__all__ = ["CommandContext", "execute_command_line", "COMMAND_REGISTRY", "get_command"]
