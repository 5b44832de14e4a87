#!/usr/bin/env python
"""Scientific acceptance: reproduce Kozlov–Hamm tilt theory on the 1-disk lane.

TPU-native analog of the reference's ``tools/reproduce_theory_parity.py``
(reference reproduce_theory_parity.py:1-1553): run the canonical caveolin
1-disk fixture through a fixed protocol, extract the radial inner-leaflet
tilt profile, and compare it against the closed-form small-deformation
theory (docs/tex/1_disk_flat.tex in the reference): on a flat tensionless
membrane the tilt magnitude decays from the disk rim as

    t(r) = t_B * K1(r / lambda) / K1(R / lambda),   lambda = sqrt(kappa / k_t)

where K1 is the modified Bessel function of the second kind.  The report
(YAML) records the fitted decay length, RMS profile residual, energy
breakdown, and pass/fail vs tolerance targets; with ``--baseline`` it is
compared field-by-field against a recorded baseline fixture
(tests/fixtures/theory_parity_baseline.yaml).

    python tools/reproduce_theory_parity.py --write-baseline   # record
    python tools/reproduce_theory_parity.py                    # compare
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASELINE = REPO / "tests" / "fixtures" / "theory_parity_baseline.yaml"
PROTOCOL = ["g10", "u", "g10", "t2e-3", "g12"]

# acceptance targets (relative): profile must match Bessel theory shape
TARGETS = {
    "profile_rms_rel": 0.10,       # RMS residual / t_B
    "decay_length_rel_err": 0.25,  # fitted lambda vs sqrt(kappa/k_t)
}


def run_protocol(thetaB: float = 0.3, n_sectors: int = 24, n_outer_rings: int = 16,
                 tilt_modulus: float = 4.0):
    """Acceptance regime: k_t=4, kappa=1 -> lambda=0.5, well resolved by the
    ring grading (the production kappa/k_t=1/225 regime has lambda ~ 0.07,
    below mesh resolution at this size — the reference's lanes refine to
    reach it; parity of the *continuum* theory is what this gate checks)."""
    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.commands.context import CommandContext
    from membrane_solver_tpu.commands.executor import execute_command_line
    from membrane_solver_tpu.meshgen import build

    data = build("kozlov_1disk", thetaB_value=thetaB, n_sectors=n_sectors,
                 n_outer_rings=n_outer_rings, tilt_modulus=tilt_modulus)
    mesh = parse_geometry(data)
    ctx = CommandContext(mesh=mesh, minimizer=Minimizer(mesh, quiet=True))
    for line in PROTOCOL:
        execute_command_line(ctx, line)
        ctx.sync_mesh()
    return ctx.minimizer


def radial_profile(minim):
    """(r, |t_in|) for membrane vertices outside the disk, radially binned."""
    import numpy as np

    p = minim.problem()
    nv = p.n_vertices
    pos = np.asarray(p.state.positions)[:nv]
    tin = np.asarray(p.state.tilts_in)[:nv]
    mesh = minim.mesh
    row_of = {vid: i for i, vid in enumerate(sorted(mesh.vertices))}
    rows = sorted(
        row_of[vid]
        for vid, v in mesh.vertices.items()
        # membrane vertices: everything except the disk body and the fixed far ring
        if str((v.options or {}).get("preset") or "") not in {"disk", "outer_rim"}
    )
    r = np.linalg.norm(pos[rows][:, :2], axis=1)
    t = np.linalg.norm(tin[rows], axis=1)
    keep = r >= 0.99  # outside/at the disk rim (R_disk = 1)
    order = np.argsort(r[keep])
    return r[keep][order], t[keep][order]


def theory_t(r, t_b, lam, R=1.0):
    from scipy.special import k1

    return t_b * k1(r / lam) / k1(R / lam)


def fit_decay_length(r, t, R=1.0):
    """1-D golden-section fit of lambda to the measured profile."""
    import numpy as np

    t_b = float(t[0])

    def rms(lam):
        return float(np.sqrt(np.mean((theory_t(r, t_b, lam, R) - t) ** 2)))

    lo, hi = 1e-3, 10.0
    phi = (math.sqrt(5) - 1) / 2
    a, b = lo, hi
    c, d = b - phi * (b - a), a + phi * (b - a)
    for _ in range(80):
        if rms(c) < rms(d):
            b = d
        else:
            a = c
        c, d = b - phi * (b - a), a + phi * (b - a)
    lam = 0.5 * (a + b)
    return lam, rms(lam), t_b


def build_report(minim) -> dict:
    import numpy as np

    gp = minim.mesh.global_parameters
    kappa = float(gp.get("bending_modulus_in", 1.0))
    k_t = float(gp.get("tilt_modulus_in", 1.0))
    lam_theory = math.sqrt(kappa / k_t)

    r, t = radial_profile(minim)
    lam_fit, rms, t_b = fit_decay_length(r, t)
    breakdown = {k: float(v) for k, v in minim.compute_energy_breakdown().items()}

    metrics = {
        "profile_rms_rel": rms / max(t_b, 1e-12),
        "decay_length_rel_err": abs(lam_fit - lam_theory) / lam_theory,
    }
    return {
        "protocol": PROTOCOL,
        "energy": float(minim.compute_energy()),
        "breakdown": breakdown,
        "t_boundary": t_b,
        "lambda_theory": lam_theory,
        "lambda_fit": lam_fit,
        "n_profile_points": int(len(r)),
        "metrics": metrics,
        "pass": {k: bool(metrics[k] <= TARGETS[k]) for k in TARGETS},
        "recorded": time.strftime("%Y-%m-%d"),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-baseline", action="store_true")
    ap.add_argument("--baseline", default=str(BASELINE))
    ap.add_argument("--report", default=None, help="also write the YAML report here")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rtol", type=float, default=1e-6,
                    help="relative tolerance vs the recorded baseline")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import yaml

    minim = run_protocol()
    report = build_report(minim)
    text = yaml.safe_dump(report, sort_keys=True)
    print(text)
    if args.report:
        Path(args.report).write_text(text)

    failed = [k for k, ok in report["pass"].items() if not ok]
    if failed:
        print(f"THEORY PARITY FAIL: {failed}")
        return 1

    base_path = Path(args.baseline)
    if args.write_baseline:
        base_path.parent.mkdir(parents=True, exist_ok=True)
        base_path.write_text(text)
        print(f"baseline written: {base_path}")
        return 0
    if base_path.exists():
        base = yaml.safe_load(base_path.read_text())
        drift = []
        for key in ("energy", "lambda_fit", "t_boundary"):
            ref, cur = float(base[key]), float(report[key])
            if abs(cur - ref) > args.rtol * max(abs(ref), 1e-12):
                drift.append(f"{key}: {ref} -> {cur}")
        if drift:
            print("BASELINE DRIFT:\n  " + "\n  ".join(drift))
            return 1
        print("baseline match OK")
    else:
        print(f"(no baseline at {base_path}; run with --write-baseline to record)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
