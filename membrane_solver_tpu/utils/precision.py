"""Precision selection.

The solver is float64 by default (the reference is f64 NumPy throughout);
float32 is the TPU high-throughput mode (MEMBRANE_SOLVER_X64=0), since TPU
f64 is software-emulated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_float():
    """The working float dtype under the current x64 setting."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
