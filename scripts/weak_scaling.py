"""Weak-scaling harness for PARTITION-AWARE distributed global BA.

Scales the synthetic problem with the device count (observations
proportional to N) and measures LM iterations/s of the partitioned
solver (points sharded by graph part, camera system psum'd).
On a real TPU pod slice this measures ICI-collective efficiency (target:
>=80% weak scaling, BASELINE.json); on a CPU host with
--xla_force_host_platform_device_count it validates correctness and
sharding only (virtual devices share the same cores).

Usage:
  python scripts/weak_scaling.py --devices 1 2 4 8 [--frames-per-dev 50]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_one(n_dev, frames_per_dev, points_per_dev):
    import jax
    import jax.numpy as jnp
    from glomap_tpu.config import TrackEstablishmentOptions
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.parallel import mesh as meshmod
    from glomap_tpu.parallel.partitioned_ba import solve_ba_partitioned
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                            synthesize_dataset)
    from glomap_tpu.config import BundleAdjusterOptions

    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=frames_per_dev * n_dev,
        num_points3D=points_per_dev * n_dev, seed=7, point2D_stddev=0.5,
        min_common_points=50))
    undistort_images(scene)
    tracks = find_tracks_for_problem(
        scene, establish_full_tracks(scene, vg),
        TrackEstablishmentOptions(min_num_tracks_per_view=1000))
    triangulate_tracks(scene, tracks)

    mesh = meshmod.make_mesh(n_dev, axis="part")
    opts = BundleAdjusterOptions(max_num_iterations=2)
    t0 = time.time()
    solve_ba_partitioned(scene, tracks, mesh, opts)  # compile + warmup
    compile_s = time.time() - t0

    opts = BundleAdjusterOptions(max_num_iterations=15,
                                 function_tolerance=0.0)
    t0 = time.time()
    cost, it = solve_ba_partitioned(scene, tracks, mesh, opts)
    dt = time.time() - t0
    return dict(devices=n_dev, frames=scene.num_frames,
                obs=int(tracks.obs_valid.sum()), lm_iters=it,
                seconds=round(dt, 3), iters_per_s=round(it / dt, 3),
                compile_s=round(compile_s, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--frames-per-dev", type=int, default=40)
    ap.add_argument("--points-per-dev", type=int, default=400)
    args = ap.parse_args()

    results = []
    for n in args.devices:
        r = run_one(n, args.frames_per_dev, args.points_per_dev)
        results.append(r)
        print(json.dumps(r))
    if len(results) > 1:
        base = results[0]["iters_per_s"]
        for r in results[1:]:
            eff = r["iters_per_s"] / base
            print(f"# weak-scaling efficiency at {r['devices']} devices: "
                  f"{eff:.2f}")


if __name__ == "__main__":
    main()
