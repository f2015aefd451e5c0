"""Worker for the multi-process multihost tests (tests/test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>
        [mode] [out_dir]
Modes: ba (default), gp, ra, mapper. Each process builds the SAME
synthetic problem, joins the jax.distributed coordination service, and
runs the partition-aware solver over the global mesh. Prints one final
line MH_RESULT ... whose fields the parent asserts identical across
processes and against a single-process run.
"""

import hashlib
import os
import sys


def _checksum_dir(path):
    h = hashlib.sha256()
    for name in sorted(os.listdir(path)):
        with open(os.path.join(path, name), "rb") as f:
            h.update(name.encode())
            h.update(f.read())
    return h.hexdigest()


def make_problem():
    import numpy as np
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                            synthesize_dataset)
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=12, num_points3D=120, seed=42,
        point2D_stddev=0.3))
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    triangulate_tracks(scene, tracks)
    rng = np.random.default_rng(0)
    scene.frame_trans += 0.01 * rng.standard_normal(scene.frame_trans.shape)
    return scene, vg, tracks


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "ba"
    out_dir = sys.argv[5] if len(sys.argv) > 5 else ""
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax
    jax.config.update("jax_enable_x64", True)
    from glomap_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=n, process_id=pid)
    assert jax.process_count() == n
    assert jax.device_count() == 4 * n

    import numpy as np
    import jax.numpy as jnp
    mesh = multihost.global_mesh()

    if mode == "ba":
        from glomap_tpu.config import BundleAdjusterOptions
        from glomap_tpu.parallel.partitioned_ba import solve_ba_partitioned
        scene, vg, tracks = make_problem()
        opts = BundleAdjusterOptions()
        opts.max_num_iterations = 20
        cost, it = solve_ba_partitioned(scene, tracks, mesh, opts,
                                        dtype=jnp.float64)
        checksum = float(np.sum(scene.frame_trans)) + \
            float(np.sum(tracks.xyz))
        print(f"MH_RESULT cost={cost:.12e} iters={it} "
              f"checksum={checksum:.10e}", flush=True)
        return

    if mode == "gp":
        from glomap_tpu.config import GlobalPositionerOptions
        from glomap_tpu.estimators.global_positioning import \
            solve_global_positioning
        scene, vg, tracks = make_problem()
        opts = GlobalPositionerOptions()
        opts.max_num_iterations = 60
        ok = solve_global_positioning(scene, vg, tracks, opts,
                                      dtype=jnp.float64, mesh=mesh)
        assert ok
        checksum = float(np.sum(scene.frame_trans)) + \
            float(np.sum(tracks.xyz[tracks.valid]))
        print(f"MH_RESULT cost=0 iters=0 checksum={checksum:.10e}",
              flush=True)
        return

    if mode == "ra":
        from glomap_tpu.parallel.sharded_ra import solve_rotations_sharded
        scene, vg, tracks = make_problem()
        scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
        ok = solve_rotations_sharded(scene, vg, mesh, dtype=jnp.float64)
        assert ok
        checksum = float(np.sum(np.abs(scene.frame_quat)))
        print(f"MH_RESULT cost=0 iters=0 checksum={checksum:.10e}",
              flush=True)
        return

    if mode == "mapper":
        from glomap_tpu.config import GlobalMapperOptions
        from glomap_tpu.controllers.global_mapper import GlobalMapper
        from glomap_tpu.io.convert import write_reconstruction
        from glomap_tpu.processors.pair_inliers import \
            image_pairs_inlier_count
        from glomap_tpu.processors.undistortion import undistort_images
        from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                                synthesize_dataset)
        scene, vg, gt = synthesize_dataset(SyntheticOptions(
            num_frames_per_rig=10, num_points3D=120, seed=43,
            point2D_stddev=0.3))
        scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
        scene.frame_trans = np.zeros((scene.num_frames, 3))
        undistort_images(scene)
        image_pairs_inlier_count(scene, vg)
        opt = GlobalMapperOptions()
        opt.skip_preprocessing = True
        opt.skip_view_graph_calibration = True
        opt.skip_relative_pose_estimation = True
        opt.skip_retriangulation = True
        opt.device_mesh_shape = (jax.device_count(),)
        tracks = GlobalMapper(opt).solve(scene, vg)
        assert tracks is not None
        out = os.path.join(out_dir, f"model_p{pid}")
        write_reconstruction(out, scene, tracks)
        digest = _checksum_dir(os.path.join(out, "0"))
        reg = int(scene.frame_registered.sum())
        print(f"MH_RESULT digest={digest} reg={reg} "
              f"tracks={tracks.num_tracks}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
