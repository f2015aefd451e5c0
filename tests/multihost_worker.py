"""Worker for the 2-process multihost test (tests/test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Each process builds the SAME synthetic problem, joins the jax.distributed
coordination service, and runs the partition-aware BA over the global
mesh. Prints one final line: MH_RESULT cost=<..> checksum=<..>.
"""

import os
import sys


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
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
    from glomap_tpu.config import BundleAdjusterOptions
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.parallel.partitioned_ba import solve_ba_partitioned
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

    mesh = multihost.global_mesh()
    opts = BundleAdjusterOptions()
    opts.max_num_iterations = 20
    cost, it = solve_ba_partitioned(scene, tracks, mesh, opts,
                                    dtype=jnp.float64)
    checksum = float(np.sum(scene.frame_trans)) + float(np.sum(tracks.xyz))
    print(f"MH_RESULT cost={cost:.12e} iters={it} checksum={checksum:.10e}",
          flush=True)


if __name__ == "__main__":
    main()
