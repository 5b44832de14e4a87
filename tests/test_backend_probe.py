"""Unit tests: accelerator probe discipline + CPUID-based cache identity."""

from __future__ import annotations

import json
import time

import pytest

from membrane_solver_tpu.utils import backend_probe
from membrane_solver_tpu.utils.cpu_identity import cpu_fingerprint, cpu_identity


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CACHE", str(tmp_path / "probe.json"))


# Budgets here are generous (120 s for a `python -c print`) on purpose: the
# suite can run while XLA saturates every core (bench/suite in a sibling
# process), and a loaded host has been observed taking >30 s just to start
# an interpreter — the budget must only bound a genuine hang.
def test_probe_alive_via_fake_backend(monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "print('BACKEND tpu 1')")
    log: list[str] = []
    assert backend_probe.probe_accelerator(budget_s=120, transcript=log) is True
    assert any("alive=True" in line for line in log)


def test_probe_dead_cpu_only_backend(monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "print('BACKEND cpu 1')")
    assert backend_probe.probe_accelerator(budget_s=120, max_attempts=1) is False


def test_probe_retries_clean_failures(monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "raise SystemExit(1)")
    log: list[str] = []
    assert (
        backend_probe.probe_accelerator(
            budget_s=120, max_attempts=3, retry_backoff_s=0.1, transcript=log
        )
        is False
    )
    assert sum("attempt" in line for line in log) == 3


def test_probe_abandons_hung_attempt_without_kill(monkeypatch):
    """A hung attempt is abandoned, not killed, and consumes the budget
    (no concurrent sibling probes — two initializing clients deadlock the
    tunnel)."""
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "import time; time.sleep(60)")
    log: list[str] = []
    t0 = time.monotonic()
    assert (
        backend_probe.probe_accelerator(budget_s=1.5, max_attempts=3, transcript=log)
        is False
    )
    assert time.monotonic() - t0 < 10
    assert sum("attempt" in line for line in log) == 1  # never spawned a sibling
    assert any("abandoned" in line for line in log)
    proc = backend_probe._abandoned[-1]
    assert proc.poll() is None, "abandoned probe was killed"


def test_probe_cache_roundtrip(monkeypatch):
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "print('BACKEND tpu 1')")
    assert backend_probe.probe_accelerator(budget_s=120) is True
    # cached verdict served without consulting the (now-broken) probe code
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "raise SystemExit(1)")
    log: list[str] = []
    assert backend_probe.probe_accelerator(budget_s=120, transcript=log) is True
    assert any("cached verdict" in line for line in log)


def test_probe_cache_expired_dead_verdict(monkeypatch, tmp_path):
    cache = tmp_path / "probe.json"
    cache.write_text(
        json.dumps({"ts": time.time() - backend_probe.DEAD_TTL_S - 1, "alive": False})
    )
    monkeypatch.setenv("MEMBRANE_SOLVER_PROBE_CODE", "print('BACKEND tpu 1')")
    assert backend_probe.probe_accelerator(budget_s=120) is True


def test_cpu_identity_uses_runtime_cpuid():
    """On this fleet /proc/cpuinfo can go stale across live migration;
    the identity must come from runtime CPUID when available."""
    ident = cpu_identity()
    assert ident.startswith(("cpuid:", "proc:"))
    if ident.startswith("cpuid:"):
        # leaf 0 vendor + leaf 1 family/model/stepping must be present
        assert "0.0:" in ident and "1.0:" in ident and "7.0:" in ident


def test_cpu_fingerprint_stable():
    assert cpu_fingerprint() == cpu_fingerprint()
    assert len(cpu_fingerprint()) == 10
