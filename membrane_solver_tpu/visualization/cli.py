"""Visualization CLI (reference ``visualization/cli.py:20-223``).

    python -m membrane_solver_tpu.visualization mesh.json --tilt --save out.png
    python -m membrane_solver_tpu.visualization gen:kozlov_1disk --divergence

Renders a mesh file (or a meshgen builder via ``gen:<name>``) with the
same options surface as the reference CLI: facet coloring by tilt
magnitude or P1 divergence, tilt arrows, edge/vertex/index overlays,
PNG export, optional pre-render instruction run.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="membrane_solver_tpu.visualization")
    ap.add_argument("input", help="mesh path or gen:<builder>")
    ap.add_argument("--tilt", action="store_true", help="color facets by |tilt|")
    ap.add_argument("--divergence", "--tilt-div", action="store_true",
                    help="color facets by P1 tilt divergence")
    ap.add_argument("--color-by", default=None,
                    choices=["tilt", "tilt_in", "tilt_out", "tilt_bilayer",
                             "div", "div_in", "div_out"],
                    help="explicit facet color mode (per-leaflet variants)")
    ap.add_argument("--tilt-arrows", action="store_true")
    ap.add_argument("--tilt-arrows-max", type=int, default=2000)
    ap.add_argument("--tilt-arrow-scale", type=float, default=0.1)
    ap.add_argument("--tilt-streamlines", action="store_true",
                    help="trace mesh-graph streamlines along the tilt field")
    ap.add_argument("--streamlines-max", "--tilt-streamlines-max",
                    type=int, default=200)
    ap.add_argument("--streamlines-steps", "--tilt-streamlines-steps",
                    type=int, default=80)
    ap.add_argument("--tilt-streamlines-cos-min", type=float, default=0.2,
                    help="minimum cosine alignment to continue a streamline")
    ap.add_argument("--patch-boundaries", action="store_true",
                    help="overlay facet patch-label boundaries")
    ap.add_argument("--patch-key", default="disk_patch")
    ap.add_argument("--no-colorbar", action="store_true")
    ap.add_argument("--no-axes", action="store_true")
    ap.add_argument("--no-edges", action="store_true")
    ap.add_argument("--no-facets", action="store_true",
                    help="disable drawing of polygonal facets")
    ap.add_argument("--vertices", "--scatter", action="store_true",
                    help="draw vertices as scatter points")
    ap.add_argument("--indices", "--show-indices", action="store_true")
    ap.add_argument("--boundary-loops", "--boundary-geodesic",
                    action="store_true",
                    help="overlay open-boundary loops with geodesic sums")
    ap.add_argument("--alpha", type=float, default=0.6)
    ap.add_argument("--transparent", action="store_true",
                    help="render facets semi-transparent (alpha 0.3)")
    ap.add_argument("--log", nargs="?", const="auto", default=None,
                    metavar="PATH",
                    help="write logs to PATH (default: next to the input mesh)")
    ap.add_argument("--title", default=None)
    ap.add_argument("--save", default=None, metavar="PNG")
    ap.add_argument("--run", default=None, metavar="MACRO",
                    help="instruction line to execute before rendering")
    ap.add_argument("--platform", default=None)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from membrane_solver_tpu import load_data, parse_geometry
    from membrane_solver_tpu.meshgen import build
    from membrane_solver_tpu.visualization.plot_core import plot_geometry

    if args.log is not None:
        import logging
        from pathlib import Path

        path = (
            args.log
            if args.log != "auto"
            else str(Path(args.input).with_suffix(".viz.log"))
            if not args.input.startswith("gen:")
            else f"{args.input[4:]}.viz.log"
        )
        handler = logging.FileHandler(path)
        handler.setFormatter(logging.Formatter("%(levelname)s:%(name)s:%(message)s"))
        logging.getLogger("membrane_solver_tpu").addHandler(handler)
        logging.getLogger("membrane_solver_tpu").setLevel(logging.INFO)

    data = build(args.input[4:]) if args.input.startswith("gen:") else load_data(args.input)
    mesh = parse_geometry(data)

    if args.run:
        from membrane_solver_tpu.commands.context import CommandContext
        from membrane_solver_tpu.commands.executor import execute_command_line
        from membrane_solver_tpu.runtime.minimizer import Minimizer

        ctx = CommandContext(mesh=mesh, minimizer=Minimizer(mesh, quiet=True))
        execute_command_line(ctx, args.run)
        ctx.sync_mesh()
        mesh = ctx.mesh

    color_by = args.color_by or (
        "divergence" if args.divergence else ("tilt" if args.tilt else None)
    )
    plot_geometry(
        mesh,
        color_by=color_by,
        show_colorbar=False if args.no_colorbar else None,
        show_tilt_arrows=args.tilt_arrows,
        tilt_arrows_max=args.tilt_arrows_max,
        tilt_arrow_scale=args.tilt_arrow_scale,
        show_tilt_streamlines=args.tilt_streamlines,
        tilt_streamlines_max=args.streamlines_max,
        tilt_streamlines_steps=args.streamlines_steps,
        tilt_streamlines_cos_min=args.tilt_streamlines_cos_min,
        show_patch_boundaries=args.patch_boundaries,
        patch_key=args.patch_key,
        show_facets=not args.no_facets,
        show_edges=not args.no_edges,
        show_vertices=args.vertices,
        show_indices=args.indices,
        show_boundary_loops=args.boundary_loops,
        no_axes=args.no_axes,
        alpha=0.3 if args.transparent else args.alpha,
        title=args.title or args.input,
        show=args.save is None,
        save_path=args.save,
    )
    if args.save:
        print(f"saved {args.save}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
