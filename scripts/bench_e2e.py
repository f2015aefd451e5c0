"""End-to-end GlobalMapper wall-clock on one TPU chip.

Prepares a gerrard-hall-scale synthetic scene in a pure-CPU subprocess
(host prep is eager-op heavy; the tunnel makes eager dispatch crawl),
then runs the full pipeline on the TPU and reports per-stage + total
wall-clock. Not the driver bench (bench.py) — a development tool.

Usage: python scripts/bench_e2e.py [--frames 100] [--points 2000]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def ckpt_path(capture, frames, points):
    return f"/tmp/glomap_e2e_scene_{capture}_{frames}_{points}.npz"


def prepare(capture, frames, points):
    from glomap_tpu.io.checkpoint import save_checkpoint
    from glomap_tpu.processors.pair_inliers import image_pairs_inlier_count
    from glomap_tpu.processors.undistortion import undistort_images

    if capture == "ring":
        from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                                synthesize_dataset)
        scene, vg, gt = synthesize_dataset(SyntheticOptions(
            num_frames_per_rig=frames, num_points3D=points, seed=7,
            point2D_stddev=0.5, inlier_match_ratio=0.9,
            min_common_points=50))
    else:  # sequential loop capture (1DSfM Alamo/Roman Forum analog)
        from glomap_tpu.utils.synthetic import (
            SequentialCaptureOptions, synthesize_sequential_dataset)
        scene, vg, gt = synthesize_sequential_dataset(
            SequentialCaptureOptions(
                num_frames=frames, num_points3D=points,
                point2D_stddev=0.5, inlier_match_ratio=0.9, seed=7))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)
    save_checkpoint(ckpt_path(capture, frames, points), scene, vg,
                    gt_frame_quat=gt["frame_quat"],
                    gt_frame_trans=gt["frame_trans"])
    print(f"# prepared: {scene.num_images} images, {vg.num_pairs} pairs, "
          f"{vg.num_matches} matches", file=sys.stderr)


def _time_probe(mm, a):
    t0 = time.time()
    x = a
    for _ in range(8):
        x = mm(x)
    float(x[0, 0])
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--capture", choices=("ring", "sequential"),
                    default="ring")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--save-out", default="",
                    help="write the final scene+tracks checkpoint here "
                         "for post-run accuracy analysis")
    ap.add_argument("--prepare", action="store_true")
    args = ap.parse_args()

    if args.prepare:
        prepare(args.capture, args.frames, args.points)
        return

    CKPT = ckpt_path(args.capture, args.frames, args.points)
    if not os.path.exists(CKPT):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--prepare", "--frames", str(args.frames),
                        "--points", str(args.points),
                        "--capture", args.capture], env=env, check=True)

    import logging
    logging.basicConfig(
        level=getattr(logging, os.environ.get("GLOMAP_LOG", "INFO")),
        format="%(asctime)s %(name)s: %(message)s")
    logging.getLogger("jax").setLevel(logging.INFO)
    import jax
    if os.environ.get("GLOMAP_COMPILE_LOG"):
        # cold-start inventory: one WARNING line per XLA compile with
        # the jitted function name + shapes (VERDICT r4 #6)
        jax.config.update("jax_log_compiles", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from glomap_tpu.config import GlobalMapperOptions
    from glomap_tpu.controllers.global_mapper import GlobalMapper
    from glomap_tpu.io.checkpoint import load_checkpoint
    from glomap_tpu.math import rotation as rotm
    from glomap_tpu.math.sim3 import umeyama_alignment, apply_sim3

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # chip-session speed probe: the tunneled chip is time-shared with
    # ~6x wall variance between sessions; this fixed 4096^2 matmul chain
    # gives every reported e2e number a same-session normalizer
    # (BENCH_NOTES reports wall * (probe_ref / probe) comparisons)
    a = jnp.ones((4096, 4096), jnp.float32)
    mm = jax.jit(lambda x: x @ x)
    float(mm(a)[0, 0])  # compile
    probe = min(_time_probe(mm, a) for _ in range(3))
    print(f"# session probe: {probe*1e3:.2f} ms / 8 matmuls",
          file=sys.stderr)

    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True  # poses already decomposed in prep
    opt.skip_view_graph_calibration = True  # priors present
    opt.opt_relpose.num_hypotheses = 256

    # run twice: the first pass pays one-time remote jit compiles
    # (minutes through the tunnel); the second measures the steady state
    # every later scene of the same bucketed shape gets
    for run in range(args.runs):
        scene, vg, _, extra = load_checkpoint(CKPT)
        t0 = time.time()
        tracks = GlobalMapper(opt).solve(scene, vg)
        total = time.time() - t0
        assert tracks is not None
        print(f"# run {run}: {total:.1f}s", file=sys.stderr)

    if args.save_out:
        from glomap_tpu.io.checkpoint import save_checkpoint
        save_checkpoint(args.save_out, scene, vg, tracks=tracks,
                        gt_frame_quat=extra["gt_frame_quat"],
                        gt_frame_trans=extra["gt_frame_trans"])
        print(f"# saved final state to {args.save_out}", file=sys.stderr)

    reg = scene.frame_registered
    est_c = scene.frame_centers()[reg]
    gq = extra["gt_frame_quat"]
    gtt = extra["gt_frame_trans"]
    gt_c = np.asarray(rotm.pose_center(jnp.asarray(gq[reg]),
                                       jnp.asarray(gtt[reg])))
    s, R, t = umeyama_alignment(est_c, gt_c)
    err = np.linalg.norm(apply_sim3(s, R, t, est_c) - gt_c, axis=-1)
    print(json.dumps({
        "metric": "mapper_e2e_seconds",
        "value": round(total, 2),
        "unit": f"s ({int(reg.sum())} frames registered, "
                f"{tracks.num_tracks} tracks)",
        "center_err_max": float(err.max()),
        "images_per_s": round(float(reg.sum()) / total, 2),
        "session_probe_ms": round(probe * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
