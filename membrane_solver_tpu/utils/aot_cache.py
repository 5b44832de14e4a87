"""Disk-backed AOT cache for jitted entry points (jax.export serialization).

The persistent XLA compilation cache removes compile time across processes,
but Python tracing + StableHLO lowering still re-run per process — on the
small interactive lanes (cube, catenoid) that cost dominates wall-clock
(~0.5 s per minimize-block signature; the reference's NumPy loop has no
such cost).  This wrapper serializes the exported StableHLO of each jitted
entry to ``~/.cache/membrane_solver_tpu/aot`` keyed by

    (entry name, arg avals/treedef, jax version, backend, source hash)

and replays it with ``jax.export.deserialize(...).call`` (~1 ms) on later
processes.  The source hash covers every ``membrane_solver_tpu`` module
file, so any code edit invalidates the cache.  Failures fall back to the
plain jitted callable; MEMBRANE_SOLVER_AOT_CACHE=0 disables the cache.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import tempfile
from typing import Callable

import jax

_CACHE_DIR = pathlib.Path(
    os.environ.get(
        "MEMBRANE_SOLVER_AOT_CACHE_DIR",
        os.path.expanduser("~/.cache/membrane_solver_tpu/aot"),
    )
)
_SRC_HASH: str | None = None


def enabled() -> bool:
    return os.environ.get("MEMBRANE_SOLVER_AOT_CACHE", "1") not in {"0", "false", "no"}


def _source_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        import membrane_solver_tpu

        root = pathlib.Path(membrane_solver_tpu.__file__).parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(p.read_bytes())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _aval_key(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        if shape is None:
            parts.append(f"py:{type(leaf).__name__}")
        else:
            parts.append(f"{tuple(shape)}:{dtype}")
    return "|".join(parts)


_REGISTERED = False


def _register_serializations() -> None:
    """Register export serialization for the package's pytree dataclasses.

    Their auxdata is pickled — it is just the class reference plus the
    (empty) static-field tuple of jax.tree_util.register_dataclass nodes,
    and the classes are importable by module path on deserialize.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    import pickle

    from jax import export as jexport

    from membrane_solver_tpu.device.state import MeshState, Topology
    from membrane_solver_tpu.runtime.jit_core import MinimizeStats, StepperState
    from membrane_solver_tpu.runtime.tilt_relax import TiltRelaxStats

    for cls in (MeshState, Topology, StepperState, MinimizeStats, TiltRelaxStats):
        try:
            jexport.register_pytree_node_serialization(
                cls,
                serialized_name=f"membrane_solver_tpu.{cls.__name__}",
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads,
            )
        except ValueError:
            pass  # already registered


def aot_wrap(name: str, static_key: str, jitted: Callable) -> Callable:
    """Wrap ``jitted`` with the disk-backed export cache.

    ``static_key`` must uniquely describe the traced computation for fixed
    arg avals (e.g. repr of the ProblemSpec + options).
    """
    if not enabled():
        return jitted

    from jax import export as jexport

    _register_serializations()

    holder: dict = {}

    def call(*args):
        fn = holder.get("fn")
        if fn is not None:
            return fn(*args)
        if holder.get("fallback"):
            return jitted(*args)
        digest = hashlib.sha256(
            "|".join(
                [
                    name,
                    static_key,
                    _aval_key(args),
                    jax.__version__,
                    jax.default_backend(),
                    _source_hash(),
                ]
            ).encode()
        ).hexdigest()[:32]
        path = _CACHE_DIR / f"{name}-{digest}.stablehlo"
        if path.exists():
            try:
                exp = jexport.deserialize(path.read_bytes())
                # jit the exported call so the replayed module lowers once
                # per process instead of per invocation
                holder["fn"] = jax.jit(exp.call)
                return holder["fn"](*args)
            except Exception:
                path.unlink(missing_ok=True)
        # export only small problems: per-process tracing dominates wall-clock
        # there, while large lanes amortize their trace over long runs and the
        # export would force one full re-compile of the re-lowered module
        total_bytes = sum(
            getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(args)
        )
        if total_bytes > int(os.environ.get("MEMBRANE_SOLVER_AOT_MAX_BYTES", 4_000_000)):
            holder["fallback"] = True
            return jitted(*args)
        try:
            exp = jexport.export(jitted)(*args)
            data = exp.serialize()
            _CACHE_DIR.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=_CACHE_DIR, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
            holder["fn"] = jax.jit(exp.call)
            return holder["fn"](*args)
        except Exception:
            if os.environ.get("MEMBRANE_SOLVER_AOT_DEBUG"):
                import traceback

                traceback.print_exc()
            # unexportable computation (or serialization limit): plain jit
            holder["fallback"] = True
            return jitted(*args)

    return call
