"""xprof op_profile of the inlier sweep on the real chip.

Loads the e2e bench checkpoint (scripts/bench_e2e.py --prepare writes
/tmp/glomap_e2e_scene.npz: ~8.3M matches / 4950 pairs at the driver
scene scale), traces 4 warm dispatches of
processors.pair_inliers._score_matches and prints the top fusions with
FLOPS / HBM-bandwidth utilization — the same speed-of-light treatment
profile_ba.py / profile_relpose.py give the other hot stages.

Usage: python scripts/profile_sweep.py
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CKPT = "/tmp/glomap_e2e_scene.npz"
TRACE_DIR = "/tmp/glomap_sweep_trace"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from glomap_tpu.io.checkpoint import load_checkpoint
    from glomap_tpu.ops import camera_models as cm
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    from glomap_tpu.processors.pair_inliers import (_join_match_features,
                                                    _score_matches)
    from glomap_tpu.processors.undistortion import device_keypoints

    if not os.path.exists(CKPT):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        import subprocess
        subprocess.run([sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_e2e.py"),
            "--prepare"], env=env, check=True)
    scene, vg, _, _ = load_checkpoint(CKPT)
    print(f"# {vg.num_pairs} pairs, {vg.num_matches} matches",
          file=sys.stderr)

    kp_rayT, kp_xyT = device_keypoints(scene)
    f1d, f2d = _join_match_features(vg)
    f1 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_i]])
    f2 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_j]])
    mp_width = block_width_for_sorted(vg.match_pair)
    args = (vg.num_pairs, vg.num_matches,
            jnp.asarray(vg.pair_config), jnp.asarray(vg.pair_quat),
            jnp.asarray(vg.pair_trans), jnp.asarray(vg.pair_F),
            jnp.asarray(vg.pair_H), jnp.asarray(vg.pair_valid),
            jnp.asarray(np.asarray(f1)), jnp.asarray(np.asarray(f2)),
            jnp.asarray(vg.pair_match_offset), jnp.asarray(vg.pair_i),
            jnp.asarray(vg.pair_j), jnp.asarray(scene.kp_offset),
            f1d, f2d, kp_rayT, kp_xyT, 1.0, 4.0, 4.0)

    packed, n_inl, score = _score_matches(*args, mp_width=mp_width)
    int(n_inl[0])  # hard sync (compile + first run)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        t0 = time.time()
        for _ in range(4):
            packed, n_inl, score = _score_matches(*args,
                                                  mp_width=mp_width)
        int(n_inl[0])
        wall = time.time() - t0
    per = wall / 4
    print(f"# traced 4 sweeps in {wall:.2f}s = {per*1e3:.0f} ms/sweep "
          f"({vg.num_matches/per/1e6:.0f}M matches/s)", file=sys.stderr)

    from xprof.convert import raw_to_tool_data as rtd
    xplanes = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb",
                               recursive=True))
    raw, _ = rtd.xspace_to_tool_data([xplanes[-1]], "op_profile", {})
    prof = json.loads(raw)
    root = prof["byProgramExcludeIdle"]
    tot = max(root.get("metrics", {}).get("rawTime", 1), 1)

    rows = []

    def walk(node, depth=0):
        m = node.get("metrics", {})
        if depth == 3:
            bw = m.get("bandwidthUtils", [0])
            rows.append((m.get("rawTime", 0), node.get("name", "?"),
                         m.get("flops", 0.0),
                         bw[0] if isinstance(bw, list) and bw else bw))
            return
        for ch in node.get("children", []):
            walk(ch, depth + 1)

    walk(root)
    rows.sort(reverse=True)
    print("# top fusions: self-time%  mxu-flops-util  hbm-bw-util  name",
          file=sys.stderr)
    for t, name, fl, bw in rows[:15]:
        print(f"#  {100*t/tot:5.1f}%  {fl:8.4f}  {bw:8.4f}  {name[:64]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "inlier_sweep_matches_per_s",
        "value": round(vg.num_matches / per / 1e6, 1),
        "unit": "M matches/s"}))


if __name__ == "__main__":
    main()
