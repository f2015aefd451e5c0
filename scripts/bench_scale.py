"""Large-scale single-chip BA benchmark: 1M+ observations.

Demonstrates the city-scale headroom of the lane-major + sorted-segment
design (CLAUDE.md scaling notes): per-observation state is (k, O) row
stacks (pads ~1.1x in HBM) and every index-axis move is an MXU matmul or
a Pallas sorted-window kernel whose work is independent of the point
count. The reference's Ceres/CHOLMOD path on problems this size takes
seconds per LM iteration on a workstation CPU (SPARSE_SCHUR factorization
dominates).

Usage: python scripts/bench_scale.py [--frames 1000] [--points 40000]
       [--tracks-per-view 1000] [--iters 20]
Prints one JSON line per run.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/glomap_scale_cache_{tag}.npz"


def prepare(args, path):
    """Directly synthesize BA arrays (poses, points, noisy observations):
    the scale bench measures the solver, not track establishment. Each
    point is observed by a contiguous run of frames along the ring — the
    visibility structure of a sequential capture."""

    rng = np.random.default_rng(11)
    F, T = args.frames, args.points
    obs_per_point = max(3, (args.tracks_per_view * F) // T)
    fx = fy = 900.0
    cx, cy = 512.0, 384.0

    # ring of cameras looking inward
    ang = 2 * np.pi * np.arange(F) / F
    centers = np.stack([8.0 * np.cos(ang), 0.1 * rng.standard_normal(F),
                        8.0 * np.sin(ang)], axis=1)
    fwd = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    up = np.tile([0.0, -1.0, 0.0], (F, 1))
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    dwn = np.cross(fwd, right)
    R = np.stack([right, dwn, fwd], axis=1)  # (F, 3, 3) cam_from_world
    t = -np.einsum("fij,fj->fi", R, centers)
    X = rng.uniform(-2.5, 2.5, (T, 3))

    # observations: point i seen by frames [f0, f0 + L) (no wraparound —
    # a sequential capture's locality structure)
    L = obs_per_point
    f0 = rng.integers(0, max(F - L, 1), T)
    o_point = np.repeat(np.arange(T, dtype=np.int32), L)
    o_frame = (f0[:, None] + np.arange(L)[None, :]).reshape(-1)
    o_frame = np.minimum(o_frame, F - 1).astype(np.int32)
    xc = np.einsum("oij,oj->oi", R[o_frame], X[o_point]) + t[o_frame]
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], axis=1)
    uv += 0.5 * rng.standard_normal(uv.shape)

    # locality ordering (tracks renumbered by mean frame) bounds the
    # per-block windows of both index axes for the Pallas kernels
    from glomap_tpu.estimators.bundle_adjustment import (_axis_window,
                                                         order_obs_for_locality)
    obs_perm, point_perm, new_of_old = order_obs_for_locality(
        o_frame, o_point, T)
    o_frame = o_frame[obs_perm]
    o_point = new_of_old[o_point[obs_perm]].astype(np.int32)
    uv = uv[obs_perm]
    X = X[point_perm]

    from glomap_tpu.math import rotation as rotm
    import jax.numpy as jnp
    fq = np.asarray(rotm.rotmat_to_quat(jnp.asarray(R)))
    # perturb the initial state so LM has real work to do
    fqn = fq + 0.002 * rng.standard_normal(fq.shape)
    fqn /= np.linalg.norm(fqn, axis=1, keepdims=True)

    O = len(o_point)
    cam_params = np.zeros((1, 16)); cam_params[0, :4] = [fx, fy, cx, cy]
    cam_T = np.zeros((1, 16, 16))
    for s in (0, 1):
        cam_T[0, s, s] = 1.0
    frame_mask = np.ones((F, 6)); frame_mask[0] = 0.0
    data = dict(
        frame_quat=fqn.astype(np.float32),
        frame_trans=(t + 0.01 * rng.standard_normal(t.shape)
                     ).astype(np.float32),
        cam_params=cam_params.astype(np.float32),
        points=(X + 0.02 * rng.standard_normal(X.shape)).astype(np.float32),
        cam_T=cam_T.astype(np.float32),
        frame_mask=frame_mask.astype(np.float32),
        o_frame=o_frame, o_cam=np.zeros(O, np.int32), o_point=o_point,
        o_sensor=np.zeros(O, np.int32),
        sensor_quat=np.asarray([[1.0, 0, 0, 0]], np.float32),
        sensor_trans=np.zeros((1, 3), np.float32),
        o_sensor_q=np.tile([1, 0, 0, 0], (O, 1)).astype(np.float32),
        o_sensor_t=np.zeros((O, 3), np.float32),
        o_kind=np.zeros(O, np.int8),
        o_uv=uv.astype(np.float32),
        o_w=np.ones(O, np.float32),
    )
    np.savez(path, **data, s_num_frames=F, s_num_cams=1, s_num_points=T,
             s_point_width=_axis_window(o_point),
             s_frame_width=_axis_window(o_frame))
    print(f"# prepared {O} obs, {T} points, {F} frames", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--tracks-per-view", type=int, default=1000)
    ap.add_argument("--pairs-per-image", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cg-iters", type=int, default=30)
    ap.add_argument("--cg-tol", type=float, default=1e-2)
    ap.add_argument("--prepare", action="store_true")
    args = ap.parse_args()
    tag = f"{args.frames}x{args.points}x{args.tracks_per_view}"
    path = CACHE.format(tag=tag)

    if args.prepare:
        prepare(args, path)
        return

    if not os.path.exists(path):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--prepare", "--frames", str(args.frames),
                        "--points", str(args.points),
                        "--tracks-per-view", str(args.tracks_per_view),
                        "--pairs-per-image", str(args.pairs_per_image)],
                       env=env, check=True)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from glomap_tpu.estimators.bundle_adjustment import _solve_ba

    data = dict(np.load(path))
    sizes = dict(num_frames=int(data.pop("s_num_frames")),
                 num_cams=int(data.pop("s_num_cams")),
                 num_points=int(data.pop("s_num_points")))
    point_width = int(data.pop("s_point_width"))
    frame_width = int(data.pop("s_frame_width"))
    num_obs = len(data["o_frame"])
    print(f"# {sizes['num_frames']} frames, {sizes['num_points']} points, "
          f"{num_obs} obs, widths p{point_width}/f{frame_width}, "
          f"device {jax.devices()[0]}", file=sys.stderr)

    a = {k: jnp.asarray(v) for k, v in data.items()}
    fast = bool((data["cam_params"][:, 4:16] == 0).all())

    def run(n_iters):
        out = _solve_ba(a["frame_quat"], a["frame_trans"], a["cam_params"],
                        a["points"], a["o_frame"], a["o_cam"], a["o_point"],
                        a["o_sensor_q"], a["o_sensor_t"], a["o_kind"],
                        a["o_uv"], a["cam_T"], a["o_w"], a["frame_mask"],
                        num_frames=sizes["num_frames"],
                        num_cams=sizes["num_cams"],
                        num_points=sizes["num_points"],
                        huber_delta=1.0, function_tol=0.0,
                        max_rejections=1 << 30,
                        max_iters=n_iters,
                        cg_iters=args.cg_iters,
                        cg_tol=args.cg_tol,
                        optimize_points=True, fast_path=fast,
                        point_width=point_width, frame_width=frame_width,
                        o_sensor=a["o_sensor"],
                        sensor_quat=a["sensor_quat"],
                        sensor_trans=a["sensor_trans"], num_sensors=1)
        float(out[4])
        return out

    t0 = time.time()
    run(1)
    print(f"# compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    best = 0.0
    for rep in range(3):
        t0 = time.time()
        out = run(args.iters)
        dt = time.time() - t0
        it = int(out[5])
        print(f"# rep {rep}: {it} iters {dt:.2f}s cost {float(out[4]):.4g}",
              file=sys.stderr)
        best = max(best, it / dt)
    print(json.dumps({
        "metric": "global_ba_iters_per_s_scale",
        "value": round(best, 3),
        "unit": f"LM iterations/s ({sizes['num_frames']} frames, "
                f"{num_obs} obs, f32)",
    }))


if __name__ == "__main__":
    main()
