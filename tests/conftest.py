"""Test configuration: force a virtual 8-device CPU platform before JAX init.

Multi-chip sharding tests run against the virtual mesh; numerical tests run in
float64 on CPU (the package enables jax_enable_x64 on import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when an axon/TPU tunnel is configured
# The AOT export cache trades a one-time export cost for fast later process
# startups; the suite creates hundreds of one-shot signatures, so keep it
# off here (tests/test_aot_cache.py exercises the cache explicitly).
os.environ.setdefault("MEMBRANE_SOLVER_AOT_CACHE", "0")
# The suite must NOT share the long-lived on-disk XLA compilation cache:
# warm reads from it SIGSEGV inside jax's get_executable_and_time once a
# few hundred executables have accumulated in-process (observed 2026-08-20
# at tests/test_vertex_tilt_lane.py after ~300 green tests, 2/2 full runs;
# the same test passes alone in 2.5 s with the same warm entry — the
# instability needs full-suite process state, the same XLA:CPU class as
# the multi-device compile crash recorded in utils/xla_cache.py).  A
# per-run private directory keeps within-run reuse (incl. the subprocess
# e2e tests, which inherit the env var) while never deserializing an
# entry produced outside this run.  An explicit user-pinned cache dir is
# honored (only the shared default is replaced).
if os.environ.get("MEMBRANE_SOLVER_COMPILE_CACHE", "1") in {"1", "true", "yes"}:
    import tempfile

    os.environ["MEMBRANE_SOLVER_COMPILE_CACHE"] = tempfile.mkdtemp(
        prefix="membrane-suite-xla-cache-"
    )
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU tunnel and overwrites
# jax_platforms ("axon,cpu"); pin tests to host CPU explicitly.
jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures"
REPO_ROOT = Path(__file__).parent.parent


@pytest.fixture
def fixtures_dir() -> Path:
    return FIXTURES


def _lane_for(name: str) -> str:
    if "benchmark" in name:
        return "benchmark"
    if "e2e" in name:
        return "e2e"
    if "acceptance" in name:
        return "acceptance"
    if "regression" in name:
        return "regression"
    return "unit"


def pytest_collection_modifyitems(config, items):
    # marker lanes from filename conventions (reference tests/conftest.py:34-61)
    for item in items:
        item.add_marker(getattr(pytest.mark, _lane_for(item.fspath.basename)))
