"""xprof op_profile of the global-BA LM step on the real chip.

Traces a jitted 10-iteration solve of the driver-bench problem and
prints the top fusions with their self-time and FLOPS/memory-bandwidth
utilization — the speed-of-light accounting BASELINE.md asks for.
Works through the tunnel (CLAUDE.md xprof note).

Usage: python scripts/profile_ba.py [--frames F --points T] [--iters N]
  (with --frames/--points, profiles the bench_scale problem of that size
  instead of the driver-bench problem — the VERDICT r4 #2 roofline run
  uses --frames 10000 --points 1000000)
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_DIR = "/tmp/glomap_ba_trace"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--points", type=int, default=0)
    ap.add_argument("--tracks-per-view", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    args_cli = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench as bench_mod
    from glomap_tpu.estimators.bundle_adjustment import _solve_ba

    if args_cli.frames:
        # bench_scale problem (city scale): reuse its cache/prepare
        import bench_scale
        tag = (f"{args_cli.frames}x{args_cli.points}"
               f"x{args_cli.tracks_per_view}")
        path = bench_scale.CACHE.format(tag=tag)
        if not os.path.exists(path):
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            subprocess.run(
                [sys.executable,
                 os.path.dirname(os.path.abspath(__file__))
                 + "/bench_scale.py", "--prepare",
                 "--frames", str(args_cli.frames),
                 "--points", str(args_cli.points),
                 "--tracks-per-view", str(args_cli.tracks_per_view)],
                env=env, check=True)
        data = dict(np.load(path))
        sizes = dict(num_frames=int(data.pop("s_num_frames")),
                     num_cams=int(data.pop("s_num_cams")),
                     num_points=int(data.pop("s_num_points")),
                     point_width=int(data.pop("s_point_width")),
                     frame_width=int(data.pop("s_frame_width")))
    else:
        data, sizes = bench_mod.build_problem()
    args = (jnp.asarray(data["frame_quat"]), jnp.asarray(data["frame_trans"]),
            jnp.asarray(data["cam_params"]), jnp.asarray(data["points"]),
            jnp.asarray(data["o_frame"]), jnp.asarray(data["o_cam"]),
            jnp.asarray(data["o_point"]), jnp.asarray(data["o_sensor_q"]),
            jnp.asarray(data["o_sensor_t"]), jnp.asarray(data["o_kind"]),
            jnp.asarray(data["o_uv"]), jnp.asarray(data["cam_T"]),
            jnp.asarray(data["o_w"]), jnp.asarray(data["frame_mask"]))
    fast = bool((data["cam_params"][:, 4:16] == 0).all())

    def run(n):
        out = _solve_ba(*args, num_frames=sizes["num_frames"],
                        num_cams=sizes["num_cams"],
                        num_points=sizes["num_points"],
                        huber_delta=1.0, function_tol=0.0,
                        max_rejections=1 << 30, max_iters=n,
                        cg_iters=30, optimize_points=True, fast_path=fast,
                        point_width=sizes["point_width"],
                        frame_width=sizes["frame_width"],
                        o_sensor=jnp.asarray(data["o_sensor"]),
                        sensor_quat=jnp.asarray(data["sensor_quat"]),
                        sensor_trans=jnp.asarray(data["sensor_trans"]),
                        num_sensors=1)
        float(out[4])
        return out

    run(1)  # compile
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        t0 = time.time()
        run(args_cli.iters)
        wall = time.time() - t0
    print(f"# traced {args_cli.iters} LM iters in {wall:.2f}s",
          file=sys.stderr)

    # op_profile via xprof converter (works offline on the xplane dump)
    from xprof.convert import raw_to_tool_data as rtd
    xplanes = sorted(glob.glob(
        TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    raw, _ = rtd.xspace_to_tool_data([xplanes[-1]], "op_profile", {})
    prof = json.loads(raw)
    root = prof["byProgramExcludeIdle"]
    tot = max(root.get("metrics", {}).get("rawTime", 1), 1)

    rows = []

    def walk(node, depth=0):
        m = node.get("metrics", {})
        if depth == 3:  # fusion leaves under by_program/program/category
            bw = m.get("bandwidthUtils", [0])
            rows.append((m.get("rawTime", 0), node.get("name", "?"),
                         m.get("flops", 0.0),
                         bw[0] if isinstance(bw, list) and bw else bw))
            return
        for ch in node.get("children", []):
            walk(ch, depth + 1)

    walk(root)
    rows.sort(reverse=True)
    # v5e speed-of-light: ~819 GB/s HBM, ~197 bf16 TFLOP/s per chip
    HBM_PEAK_GBS = 819.0
    print("# top fusions: self-time%  mxu-flops-util  hbm-bw-util  "
          "hbm-GB/s  name", file=sys.stderr)
    for t, name, fl, bw in rows[:15]:
        print(f"#  {100*t/tot:5.1f}%  {fl:8.4f}  {bw:8.4f}  "
              f"{bw*HBM_PEAK_GBS:7.1f}  {name[:56]}", file=sys.stderr)
    # time-weighted aggregate utilizations over ALL fusions: the
    # roofline verdict — a step is HBM-bound iff this average sits near
    # 1.0 (each fusion's bandwidthUtils[0] is its achieved fraction of
    # HBM peak while it runs)
    t_sum = sum(r[0] for r in rows) or 1
    avg_bw = sum(r[0] * r[3] for r in rows) / t_sum
    avg_fl = sum(r[0] * r[2] for r in rows) / t_sum
    print(f"# time-weighted avg: hbm-bw-util {avg_bw:.3f} "
          f"({avg_bw*HBM_PEAK_GBS:.0f} GB/s of {HBM_PEAK_GBS:.0f}), "
          f"mxu-flops-util {avg_fl:.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "ba_trace",
        "wall_s": round(wall, 3),
        "iters": args_cli.iters,
        "frames": sizes["num_frames"],
        "avg_hbm_bw_util": round(avg_bw, 4),
        "avg_hbm_gbs": round(avg_bw * HBM_PEAK_GBS, 1),
        "avg_mxu_util": round(avg_fl, 5)}))


if __name__ == "__main__":
    main()
