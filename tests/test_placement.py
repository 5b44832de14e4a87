"""Latency-aware backend placement policy (utils/placement.py).

The policy must: stay out of the way on CPU-default sessions (this
suite), honor explicit pins, and on a single-accelerator host route
problems at or below the size threshold to the co-resident XLA:CPU
backend — mirroring the reference's Fortran-vs-NumPy engine dispatch
(fortran_kernels/loader.py:16-298)."""

from __future__ import annotations

import jax
import pytest

from membrane_solver_tpu.utils import placement


class _FakeDev:
    def __init__(self, platform):
        self.platform = platform


def _fake_jax(monkeypatch, *, backend, devices, cpus):
    monkeypatch.setattr(jax, "default_backend", lambda: backend)

    def fake_devices(kind=None):
        if kind == "cpu":
            if not cpus:
                raise RuntimeError("no cpu")
            return cpus
        return devices

    monkeypatch.setattr(jax, "devices", fake_devices)


def test_noop_on_cpu_default_session(monkeypatch):
    monkeypatch.delenv("MEMBRANE_SOLVER_BACKEND", raising=False)
    assert placement.compute_device(64) is None  # this suite runs on CPU


def test_explicit_pins(monkeypatch):
    cpu = _FakeDev("cpu")
    _fake_jax(monkeypatch, backend="tpu", devices=[_FakeDev("tpu")], cpus=[cpu])
    monkeypatch.setenv("MEMBRANE_SOLVER_BACKEND", "tpu")
    assert placement.compute_device(64) is None
    monkeypatch.setenv("MEMBRANE_SOLVER_BACKEND", "default")
    assert placement.compute_device(64) is None
    monkeypatch.setenv("MEMBRANE_SOLVER_BACKEND", "cpu")
    assert placement.compute_device(1 << 20) is cpu


def test_auto_threshold_on_accelerator_host(monkeypatch):
    cpu = _FakeDev("cpu")
    _fake_jax(monkeypatch, backend="tpu", devices=[_FakeDev("tpu")], cpus=[cpu])
    monkeypatch.setenv("MEMBRANE_SOLVER_BACKEND", "auto")
    monkeypatch.setenv("MEMBRANE_SOLVER_SMALL_MESH_CPU_MAX", "2048")
    assert placement.compute_device(2048) is cpu
    assert placement.compute_device(4096) is None


def test_auto_noop_on_multidevice_session(monkeypatch):
    cpu = _FakeDev("cpu")
    _fake_jax(
        monkeypatch,
        backend="tpu",
        devices=[_FakeDev("tpu"), _FakeDev("tpu")],
        cpus=[cpu],
    )
    monkeypatch.setenv("MEMBRANE_SOLVER_BACKEND", "auto")
    assert placement.compute_device(64) is None


def test_problem_reapplies_placement_each_entry(monkeypatch):
    """Two minimizers of different sizes interleaving in one process must
    each re-establish their own placement: problem() calls apply_placement
    on EVERY entry, not only on recompiles (the default device is
    process-global)."""
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.runtime import minimizer as mz

    calls = []
    monkeypatch.setattr(
        placement, "apply_placement", lambda cap: calls.append(cap)
    )
    mesh = parse_geometry(load_data("meshes/cube.json"))
    mn = Minimizer(mesh, quiet=True)
    mn.problem()
    mn.problem()
    mn.problem()
    assert len(calls) == 3
    assert all(c == calls[0] for c in calls)


def test_effective_backend_follows_default_device():
    import jax

    cpu = jax.devices("cpu")[0]
    try:
        jax.config.update("jax_default_device", cpu)
        assert placement.effective_backend() == "cpu"
    finally:
        jax.config.update("jax_default_device", None)
    assert placement.effective_backend() == jax.default_backend()
