"""CLI: glomap_tpu {mapper, mapper_resume, rotation_averager}.

Counterpart of glomap/glomap.cc + glomap/exe/ (command dispatch table,
RunMapper :16, RunMapperResume :108, RunRotationAverager :16) with the
same dotted flag surface as the reference OptionManager
(--BundleAdjustment.optimize_principal_point=1 etc; see
glomap_tpu/config.py for the full registry).
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

from glomap_tpu import config as cfg


def _apply_dotted_flags(opt, unknown_args):
    """Map --Module.option=value / --Module.option value onto dataclasses."""
    i = 0
    flat = cfg.flatten_options(opt)
    # map reference dotted names to our nested fields
    alias = {
        "ViewGraphCalib": "opt_vgcalib",
        "RelPoseEstimation": "opt_relpose",
        "RotationEstimator": "opt_ra",
        "RotationAveraging": "opt_ra",
        "TrackEstablishment": "opt_track",
        "GlobalPositioning": "opt_gp",
        "BundleAdjustment": "opt_ba",
        "Triangulation": "opt_triangulator",
        "GravityRefiner": "opt_gravity_refiner",
        "Thresholds": "inlier_thresholds",
    }
    while i < len(unknown_args):
        arg = unknown_args[i]
        if not arg.startswith("--"):
            i += 1
            continue
        body = arg[2:]
        if "=" in body:
            name, value = body.split("=", 1)
            i += 1
        else:
            name = body
            value = unknown_args[i + 1] if i + 1 < len(unknown_args) else ""
            i += 2
        parts = name.split(".")
        if len(parts) == 2 and parts[0] in alias:
            field = parts[1]
            # reference triangulation flags drop the tri_ prefix
            if parts[0] == "Triangulation" and field in (
                    "complete_max_reproj_error", "merge_max_reproj_error",
                    "min_angle"):
                field = "tri_" + field
            name = alias[parts[0]] + "." + field
        if name.endswith(".use_gpu") or name.endswith(".gpu_index"):
            continue  # reference GPU toggles: always-on TPU here
        try:
            cfg.set_option(opt, name, value)
        except AttributeError:
            # the reference's boost::program_options rejects unknown
            # options outright (option_manager.cc Parse) — a typo'd flag
            # must not silently run with defaults
            print(f"error: unrecognised option '--{name}'",
                  file=sys.stderr)
            raise SystemExit(2)
    return opt


def _enter_distributed(opt):
    """Join the jax.distributed coordination service and put every solver
    on the global device mesh (multi-host entry, SURVEY.md §2.3).
    Coordinator/process-count/process-id come from the
    GLOMAP_COORDINATOR / GLOMAP_NUM_PROCESSES / GLOMAP_PROCESS_ID env
    vars (all three optional on TPU pods with the standard launcher).
    Returns True when this process should write outputs (primary)."""
    import jax
    from glomap_tpu.parallel import multihost
    multihost.initialize()
    opt.device_mesh_shape = (jax.device_count(),)
    return multihost.is_primary()


def run_mapper(args, extra):
    from glomap_tpu.controllers.global_mapper import GlobalMapper
    from glomap_tpu.io.convert import database_to_scene, write_reconstruction
    from glomap_tpu.io.database import read_database

    opt = _apply_dotted_flags(cfg.GlobalMapperOptions(), extra)
    primary = _enter_distributed(opt) if args.distributed else True
    logging.info("Loading database %s", args.database_path)
    scene, vg = database_to_scene(read_database(args.database_path))
    tracks = GlobalMapper(opt).solve(scene, vg)
    if tracks is None:
        print("mapper failed", file=sys.stderr)
        return 1
    if not primary:
        return 0
    if args.image_path:
        from glomap_tpu.processors.color_extraction import extract_colors
        extract_colors(scene, tracks, args.image_path)
    dirs = write_reconstruction(args.output_path, scene, tracks,
                                binary=args.output_format == "bin")
    print(f"Reconstruction written to: {', '.join(dirs)}")
    return 0


def run_mapper_resume(args, extra):
    from glomap_tpu.controllers.global_mapper import GlobalMapper
    from glomap_tpu.io.convert import model_to_scene, write_reconstruction
    from glomap_tpu.scene.view_graph import ViewGraph

    opt = _apply_dotted_flags(cfg.mapper_resume_options(), extra)
    primary = _enter_distributed(opt) if args.distributed else True
    scene, tracks = model_to_scene(args.input_path)
    vg = ViewGraph()
    tracks = GlobalMapper(opt).solve(scene, vg, tracks)
    if tracks is None:
        print("mapper_resume failed", file=sys.stderr)
        return 1
    if not primary:
        return 0
    dirs = write_reconstruction(args.output_path, scene, tracks,
                                binary=args.output_format == "bin")
    print(f"Reconstruction written to: {', '.join(dirs)}")
    return 0


def run_rotation_averager(args, extra):
    from glomap_tpu.controllers.rotation_averager import (
        RotationAveragerOptions, solve_rotation_averaging)
    from glomap_tpu.estimators.gravity_refinement import refine_gravity
    from glomap_tpu.io import pose_io
    from glomap_tpu.scene.arrays import Scene

    opts = RotationAveragerOptions()
    opts.use_gravity = bool(args.gravity_path)
    _apply_dotted_flags(opts, extra)

    scene = Scene()
    vg = pose_io.read_rel_pose(args.relpose_path, scene)
    if args.weight_path:
        opts.use_weight = True
        pose_io.read_rel_weight(args.weight_path, scene, vg)
    if args.gravity_path:
        pose_io.read_gravity(args.gravity_path, scene)
        if args.refine_gravity:
            refine_gravity(scene, vg)
    vg.keep_largest_connected_component(scene)
    if not solve_rotation_averaging(scene, vg, opts):
        print("rotation averaging failed", file=sys.stderr)
        return 1
    pose_io.write_global_rotations(args.output_path, scene)
    print(f"Global rotations written to: {args.output_path}")
    return 0


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s")
    parser = argparse.ArgumentParser(
        prog="glomap_tpu",
        description="TPU-native global structure-from-motion "
                    "(GLOMAP capabilities on JAX/XLA/Pallas)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("mapper", help="full global SfM from a COLMAP db")
    p.add_argument("--database_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--image_path", default="")
    p.add_argument("--output_format", default="bin", choices=["bin", "txt"])
    p.add_argument("--distributed", action="store_true",
                   help="join jax.distributed (GLOMAP_COORDINATOR / "
                        "GLOMAP_NUM_PROCESSES / GLOMAP_PROCESS_ID env) "
                        "and run solvers on the global device mesh")
    p.set_defaults(func=run_mapper)

    p = sub.add_parser("mapper_resume",
                       help="resume from an existing reconstruction "
                            "(global positioning + BA only)")
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--image_path", default="")
    p.add_argument("--output_format", default="bin", choices=["bin", "txt"])
    p.add_argument("--distributed", action="store_true",
                   help="join jax.distributed and run solvers on the "
                        "global device mesh")
    p.set_defaults(func=run_mapper_resume)

    p = sub.add_parser("rotation_averager",
                       help="standalone rotation averaging from a relative"
                            " pose file")
    p.add_argument("--relpose_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--gravity_path", default="")
    p.add_argument("--weight_path", default="")
    p.add_argument("--refine_gravity", action="store_true")
    p.set_defaults(func=run_rotation_averager)

    args, extra = parser.parse_known_args(argv)
    return args.func(args, extra)


if __name__ == "__main__":
    sys.exit(main())
