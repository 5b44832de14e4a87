"""Precision-floor helper lanes (utils/precision.py).

The f64 lanes keep the reference's 1e-300 division guards; f32 lanes must
floor far above the 1.2e-38 minimum normal or the guards underflow to 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def test_default_float_tracks_x64_setting():
    import jax

    from membrane_solver_tpu.utils.precision import default_float

    # conftest runs with x64 enabled (package import turns it on)
    assert jax.config.jax_enable_x64
    assert default_float() == jnp.float64


def test_tiny_floors_are_representable():
    from membrane_solver_tpu.utils.precision import degen, tiny

    assert tiny(jnp.float64) == 1e-300
    assert np.float64(tiny(jnp.float64)) > 0.0
    # the f32 floor must survive the cast (1e-300 would flush to 0)
    assert np.float32(tiny(jnp.float32)) > 0.0
    assert np.float32(1e-300) == 0.0
    assert np.float32(degen(jnp.float32)) > 0.0


def test_fmax_tiny_guards_zero_denominators():
    from membrane_solver_tpu.utils.precision import fmax_tiny, tiny_like

    x64 = jnp.zeros(3, jnp.float64)
    out = fmax_tiny(x64)
    assert float(out[0]) == 1e-300
    assert tiny_like(x64) == 1e-300
    x32 = jnp.zeros(3, jnp.float32)
    out32 = fmax_tiny(x32)
    assert out32.dtype == jnp.float32
    assert float(out32[0]) == np.float32(1e-30)
    # the guard actually prevents inf
    assert np.isfinite(float(1.0 / out32[0]))
