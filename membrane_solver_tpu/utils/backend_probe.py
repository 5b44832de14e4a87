"""Accelerator liveness probing with a no-kill, no-concurrency discipline.

The TPU in this environment is reached through a tunnel that has two
failure modes the framework must survive (both observed on this host):

1. ``jax.devices()`` can block *forever* when the tunnel is wedged — a
   process that touches the backend before checking hangs at 0%% CPU.
   The reference's ``main.py`` never blocks on a device
   (/root/reference/main.py:127-551); neither may our CLI.
2. Killing a client *mid backend-init* can wedge a slow-but-alive tunnel
   for every later client.  So the probe subprocess is never killed: when
   its budget expires it is ABANDONED (left to finish or hang on its own,
   in its own session) and the caller proceeds without the accelerator.

A second rule follows from the tunnel's one-client-at-a-time semantics:
retries only happen after a CLEAN failure exit of the previous attempt —
two concurrently-initializing clients deadlock each other, so a hung
attempt consumes the whole budget rather than spawning a sibling.

Results are cached in a small JSON file so that a wedged tunnel costs the
probe timeout once, not once per CLI invocation (alive verdicts are
trusted longer than dead ones — a dead tunnel has recovered on this host
within minutes before).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_PROBE_CODE = "import jax; print('BACKEND', jax.default_backend(), len(jax.devices()))"

ALIVE_TTL_S = 600.0  # trust an "alive" verdict for 10 min
DEAD_TTL_S = 120.0  # re-probe a "dead" verdict after 2 min

_abandoned: list[subprocess.Popen] = []  # keep refs so GC never kills them


def _cache_path() -> str:
    override = os.environ.get("MEMBRANE_SOLVER_PROBE_CACHE")
    return override or os.path.join(tempfile.gettempdir(), "membrane_solver_tpu_probe.json")


def _read_cache() -> dict | None:
    try:
        with open(_cache_path()) as fh:
            entry = json.load(fh)
        age = time.time() - float(entry["ts"])
        ttl = ALIVE_TTL_S if entry.get("alive") else DEAD_TTL_S
        if 0 <= age <= ttl:
            return entry
    except Exception:
        pass
    return None


def _write_cache(alive: bool, detail: str) -> None:
    try:
        with open(_cache_path(), "w") as fh:
            json.dump({"ts": time.time(), "alive": alive, "detail": detail}, fh)
    except OSError:
        pass


def probe_accelerator(
    budget_s: float = 300.0,
    max_attempts: int = 3,
    retry_backoff_s: float = 30.0,
    use_cache: bool = True,
    transcript: list | None = None,
) -> bool:
    """Return True when a non-CPU JAX backend answers within ``budget_s``.

    ``transcript`` (if given) collects one human-readable line per event —
    cache hits, attempt outcomes, abandonments — so callers (bench.py)
    can record *why* a verdict was reached, not just the verdict.
    """
    log = transcript if transcript is not None else []

    def note(msg: str) -> None:
        log.append(msg)
        print(f"backend_probe: {msg}", file=sys.stderr)

    cached = _read_cache() if use_cache else None
    if cached is not None:
        note(
            f"cached verdict alive={cached['alive']} "
            f"(age {time.time() - cached['ts']:.0f}s: {cached.get('detail', '')})"
        )
        return bool(cached["alive"])

    code = os.environ.get("MEMBRANE_SOLVER_PROBE_CODE", _PROBE_CODE)
    env = {
        k: v for k, v in os.environ.items() if k not in {"JAX_PLATFORMS", "MEMBRANE_SOLVER_BACKEND"}
    }
    deadline = time.monotonic() + budget_s
    attempt = 0
    while attempt < max_attempts and time.monotonic() < deadline:
        attempt += 1
        t0 = time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
            start_new_session=True,  # survives us; never killed mid-init
        )
        # poll (instead of wait(timeout=...)) so expiry abandons, not kills
        while proc.poll() is None and time.monotonic() < deadline:
            time.sleep(0.25)
        if proc.poll() is None:
            _abandoned.append(proc)
            note(
                f"attempt {attempt}: still initializing after "
                f"{time.monotonic() - t0:.0f}s — abandoned (never killed: a "
                "mid-init kill can wedge a slow-but-alive tunnel)"
            )
            _write_cache(False, f"probe abandoned after {budget_s:.0f}s budget")
            return False
        out = (proc.stdout.read() if proc.stdout else "") or ""
        words = out.split()
        alive = proc.returncode == 0 and "BACKEND" in words and "cpu" not in words
        note(
            f"attempt {attempt}: exit={proc.returncode} in "
            f"{time.monotonic() - t0:.1f}s, output={out.strip()!r} -> alive={alive}"
        )
        if alive:
            _write_cache(True, out.strip())
            return True
        # clean failure (backend raised / fell back to cpu): retry after a
        # backoff — tunnels have recovered within minutes on this host
        if attempt < max_attempts and time.monotonic() + retry_backoff_s < deadline:
            note(f"retrying in {retry_backoff_s:.0f}s")
            time.sleep(retry_backoff_s)
    _write_cache(False, f"{attempt} attempt(s) failed")
    return False


def ensure_responsive_backend(budget_s: float | None = None, quiet: bool = False) -> str:
    """CLI-startup guard: pin XLA:CPU when the accelerator cannot answer.

    Returns the platform the process will use ("cpu" or "accelerator").
    Honors ``MEMBRANE_SOLVER_BACKEND``: ``cpu`` pins CPU without probing;
    ``tpu``/``default``/``accelerator`` skips the guard entirely (the user
    accepted the hang risk by pinning).  No-op when JAX is already
    CPU-only (tests, ``--cpu`` runs).
    """
    import jax

    mode = os.environ.get("MEMBRANE_SOLVER_BACKEND", "auto").strip().lower()
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    if mode in {"tpu", "default", "accelerator"}:
        return "accelerator"
    platforms = jax.config.jax_platforms
    if platforms and set(platforms.split(",")) <= {"cpu"}:
        return "cpu"
    if budget_s is None:
        budget_s = float(os.environ.get("MEMBRANE_SOLVER_PROBE_TIMEOUT", "15"))
    if probe_accelerator(budget_s=budget_s, max_attempts=1):
        return "accelerator"
    if not quiet:
        print(
            "warning: accelerator backend did not answer within "
            f"{budget_s:.0f}s; falling back to XLA:CPU "
            "(pin with MEMBRANE_SOLVER_BACKEND=tpu to wait for it)",
            file=sys.stderr,
        )
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
