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


# reference dotted-module prefixes -> our nested option fields
_MODULE_ALIAS = {
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

# reference top-level flags (option_manager.cc:65-68) -> our fields
_TOP_ALIAS = {
    "ba_iteration_num": "num_iteration_bundle_adjustment",
    "retriangulation_iteration_num": "num_iteration_retriangulation",
}


def _resolve_flag_name(name: str) -> str | None:
    """Reference flag spelling -> dotted field path (None = consumed)."""
    if name in _TOP_ALIAS:
        return _TOP_ALIAS[name]
    if name.endswith(".use_gpu") or name.endswith(".gpu_index"):
        return None  # reference GPU toggles: always-on TPU here
    parts = name.split(".")
    if len(parts) == 2 and parts[0] in _MODULE_ALIAS:
        field = parts[1]
        # reference triangulation flags drop the tri_ prefix
        if parts[0] == "Triangulation" and field in (
                "complete_max_reproj_error", "merge_max_reproj_error",
                "min_angle"):
            field = "tri_" + field
        return _MODULE_ALIAS[parts[0]] + "." + field
    return name


def _apply_log_flags(name: str, value: str) -> bool:
    """Handle the reference's glog flags (option_manager.cc:23-24):
    log_to_stderr (FLAGS_logtostderr) and log_level (FLAGS_v)."""
    if name == "log_to_stderr":
        # consumed no-op: python logging already writes to stderr by
        # default (the glog counterpart toggles file vs stderr sinks)
        return True
    if name == "log_level":
        # glog -v: 0 = default, >=1 = verbose
        logging.getLogger().setLevel(
            logging.DEBUG if int(value) >= 1 else logging.INFO)
        return True
    return False


def _apply_dotted_flags(opt, unknown_args, flat_ok=False):
    """Map --Module.option=value / --Module.option value onto dataclasses,
    accepting the reference OptionManager's exact flag spellings
    (option_manager.cc AddAndRegister*Option names, incl. the top-level
    ba_iteration_num / retriangulation_iteration_num / log_* flags).
    flat_ok: `opt` is a flat (non-nested) options object — dotted module
    prefixes fall back to the bare field name (rotation_averager)."""
    i = 0
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
        if _apply_log_flags(name, value):
            continue
        name = _resolve_flag_name(name)
        if name is None:
            continue
        try:
            cfg.set_option(opt, name, value)
        except AttributeError:
            try:
                if not flat_ok:
                    raise AttributeError(name)
                cfg.set_option(opt, name.split(".")[-1], value)
            except AttributeError:
                # the reference's boost::program_options rejects unknown
                # options outright (option_manager.cc Parse) — a typo'd
                # flag must not silently run with defaults
                print(f"error: unrecognised option '--{name}'",
                      file=sys.stderr)
                raise SystemExit(2)
    return opt


def _registry_epilog(opt) -> str:
    """--help dump of the dotted-flag registry with defaults (the
    reference prints its program_options description,
    option_manager.cc:322-327)."""
    # display prefixes: our nested field -> the reference module name
    rev = {}
    for mod, fld in _MODULE_ALIAS.items():
        rev.setdefault(fld, mod)
    rev_top = {v: k for k, v in _TOP_ALIAS.items()}
    lines = ["The following options can be specified via command-line:",
             "  --log_to_stderr (default: false)",
             "  --log_level (default: 0)"]
    for name, val in cfg.flatten_options(opt).items():
        parts = name.split(".")
        if len(parts) == 2 and parts[0] in rev:
            field = parts[1]
            if parts[0] == "opt_triangulator" and field.startswith("tri_") \
                    and field in ("tri_complete_max_reproj_error",
                                  "tri_merge_max_reproj_error",
                                  "tri_min_angle"):
                field = field[4:]
            disp = rev[parts[0]] + "." + field
        else:
            disp = rev_top.get(name, name)
        if isinstance(val, bool):
            val = str(val).lower()
        lines.append(f"  --{disp} (default: {val})")
    return "\n".join(lines)


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
    if args.checkpoint_dir:
        opt.checkpoint_dir = args.checkpoint_dir
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
    if args.checkpoint_dir:
        opt.checkpoint_dir = args.checkpoint_dir
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
    _apply_dotted_flags(opts, extra, flat_ok=True)

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

    p = sub.add_parser("mapper", help="full global SfM from a COLMAP db",
                       epilog=_registry_epilog(cfg.GlobalMapperOptions()),
                       formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--database_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--image_path", default="")
    p.add_argument("--output_format", default="bin", choices=["bin", "txt"])
    p.add_argument("--checkpoint_dir", default="",
                   help="write stage_NN.npz after every pipeline stage "
                        "and auto-resume from the latest on restart")
    p.add_argument("--distributed", action="store_true",
                   help="join jax.distributed (GLOMAP_COORDINATOR / "
                        "GLOMAP_NUM_PROCESSES / GLOMAP_PROCESS_ID env) "
                        "and run solvers on the global device mesh")
    p.set_defaults(func=run_mapper)

    p = sub.add_parser("mapper_resume",
                       help="resume from an existing reconstruction "
                            "(global positioning + BA only)",
                       epilog=_registry_epilog(cfg.mapper_resume_options()),
                       formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--image_path", default="")
    p.add_argument("--output_format", default="bin", choices=["bin", "txt"])
    p.add_argument("--checkpoint_dir", default="",
                   help="write stage_NN.npz after every pipeline stage "
                        "and auto-resume from the latest on restart")
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
