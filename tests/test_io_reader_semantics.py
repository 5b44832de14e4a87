"""Edge-case lanes for the geometry reader (parse_geometry).

Parity: reference geometry/io_readers.py semantics — defines dependency
resolution, volume-mode default pairing, constraint/pin aliases, implicit
module registration, and preset (definitions) option merging.
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import parse_geometry


def _base(**extra):
    data = {
        "vertices": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        "edges": [[0, 1], [1, 2], [2, 0]],
        "faces": [[0, 1, 2]],
        "energy_modules": ["surface"],
        "global_parameters": {"surface_tension": 1.0},
    }
    data.update(extra)
    return data


def test_defines_resolve_in_dependency_order():
    mesh = parse_geometry(
        _base(defines={"a": "2*b", "b": "3", "c": "a + b + 1"})
    )
    gp = mesh.global_parameters
    assert float(gp.get("b")) == 3.0
    assert float(gp.get("a")) == 6.0
    assert float(gp.get("c")) == 10.0


def test_defines_may_reference_global_parameters():
    mesh = parse_geometry(
        _base(
            global_parameters={"surface_tension": 2.5},
            defines={"double_gamma": "2 * surface_tension"},
        )
    )
    assert float(mesh.global_parameters.get("double_gamma")) == 5.0


def test_defines_unresolvable_raises():
    with pytest.raises(ValueError, match="Could not resolve defines"):
        parse_geometry(_base(defines={"a": "b + 1", "b": "a + 1"}))


def test_defines_must_be_mapping():
    with pytest.raises(TypeError):
        parse_geometry(_base(defines=["a = 1"]))


def test_volume_mode_default_pairing():
    # neither key: lagrange + projection off
    gp = parse_geometry(_base()).global_parameters
    assert gp.get("volume_constraint_mode") == "lagrange"
    assert gp.get("volume_projection_during_minimization") is False
    # mode only: penalty implies projection on
    gp = parse_geometry(
        _base(global_parameters={"surface_tension": 1.0,
                                 "volume_constraint_mode": "penalty"})
    ).global_parameters
    assert gp.get("volume_projection_during_minimization") is True
    # projection only: off implies lagrange, on implies penalty
    gp = parse_geometry(
        _base(global_parameters={"surface_tension": 1.0,
                                 "volume_projection_during_minimization": False})
    ).global_parameters
    assert gp.get("volume_constraint_mode") == "lagrange"
    gp = parse_geometry(
        _base(global_parameters={"surface_tension": 1.0,
                                 "volume_projection_during_minimization": True})
    ).global_parameters
    assert gp.get("volume_constraint_mode") == "penalty"


def test_constraint_alias_normalized_to_pin_to_plane():
    mesh = parse_geometry(
        _base(constraint_modules=["pin_surface_group_to_shape"])
    )
    assert "pin_to_plane" in list(mesh.constraint_modules)
    assert "pin_surface_group_to_shape" not in list(mesh.constraint_modules)


def test_pin_key_aliases_rewritten_in_global_parameters():
    mesh = parse_geometry(
        _base(
            global_parameters={
                "surface_tension": 1.0,
                "pin_surface_group_to_shape_mode": "slide",
                "pin_surface_group_to_shape_normal": [0, 0, 1],
            }
        )
    )
    gp = mesh.global_parameters
    assert gp.get("pin_to_plane_mode") == "slide"
    assert list(gp.get("pin_to_plane_normal")) == [0, 0, 1]
    assert gp.get("pin_surface_group_to_shape_mode") is None


def test_surface_module_implied_by_positive_tension():
    data = _base()
    data.pop("energy_modules")
    mesh = parse_geometry(data)
    assert "surface" in list(mesh.energy_modules)


def test_target_surface_area_implies_global_area_constraint():
    mesh = parse_geometry(
        _base(global_parameters={"surface_tension": 1.0, "target_surface_area": 2.0})
    )
    assert "global_area" in list(mesh.constraint_modules)


def test_preset_definitions_merge_with_explicit_options_winning():
    data = _base(
        definitions={"rim": {"fixed": True, "tilt_modulus": 4.0}},
        vertices=[
            [0, 0, 0],
            [1, 0, 0, {"preset": "rim"}],
            [0, 1, 0, {"preset": "rim", "tilt_modulus": 9.0}],
        ],
    )
    mesh = parse_geometry(data)
    v2, v3 = mesh.vertices[1], mesh.vertices[2]
    assert v2.fixed or v2.options.get("fixed")  # preset applied
    assert float(v2.options.get("tilt_modulus")) == 4.0
    assert float(v3.options.get("tilt_modulus")) == 9.0  # explicit wins
    assert v2.options.get("preset") == "rim"  # preset name retained


def test_unknown_preset_keeps_name_without_error():
    data = _base(
        vertices=[[0, 0, 0], [1, 0, 0], [0, 1, 0, {"preset": "ghost"}]],
    )
    mesh = parse_geometry(data)
    assert mesh.vertices[2].options.get("preset") == "ghost"


def test_float_coercion_of_string_parameters():
    mesh = parse_geometry(
        _base(global_parameters={"surface_tension": "2.0"})
    )
    assert mesh.global_parameters.get("surface_tension") == 2.0
