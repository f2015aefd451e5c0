"""Multi-host distribution: 2 CPU processes x 4 virtual devices form one
8-device mesh via jax.distributed and reproduce the single-process
partition-aware BA (SURVEY.md §2.3 "jax.distributed init per host, device
mesh over pod slice").

The workers run in fresh subprocesses (tests/multihost_worker.py) because
jax.distributed can only be initialized once per process.
"""

import pytest

# full-pipeline runs take minutes each; see pyproject markers
pytestmark = pytest.mark.slow

import os
import re
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(n, mode="ba", out_dir=""):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(n), str(port), mode,
         out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(n)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        outs.append(out)
    return outs


def _checksums(outs):
    vals = []
    for out in outs:
        m = re.search(r"MH_RESULT cost=(\S+) iters=(\d+) checksum=(\S+)",
                      out)
        assert m, f"no result line in worker output:\n{out[-3000:]}"
        vals.append(float(m.group(3)))
    return vals


def test_two_process_partitioned_ba():
    outs = _run_workers(2)
    results = []
    for out in outs:
        m = re.search(r"MH_RESULT cost=(\S+) iters=(\d+) checksum=(\S+)",
                      out)
        assert m, f"no result line in worker output:\n{out[-3000:]}"
        results.append((float(m.group(1)), int(m.group(2)),
                        float(m.group(3))))

    # both processes observed the identical global solve
    (c0, i0, s0), (c1, i1, s1) = results
    assert np.isfinite(c0)
    assert c0 == c1 and i0 == i1
    np.testing.assert_allclose(s0, s1, rtol=1e-12)

    # and it matches a fresh single-process 8-device run of the same
    # problem (the parent pytest process has 8 virtual devices)
    import jax.numpy as jnp
    from glomap_tpu.config import BundleAdjusterOptions
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.parallel import mesh as meshmod
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

    mesh = meshmod.make_mesh(8, axis="part")
    opts = BundleAdjusterOptions()
    opts.max_num_iterations = 20
    cost, it = solve_ba_partitioned(scene, tracks, mesh, opts,
                                    dtype=jnp.float64)
    assert abs(cost - c0) / max(abs(cost), 1e-12) < 1e-8


def test_two_process_partitioned_gp():
    """Partitioned global positioning over the 2-process global mesh:
    both processes observe the identical global solve, and it matches a
    fresh single-process 8-device run (host-side plans and the GP random
    init are bit-identical by design)."""
    outs = _run_workers(2, mode="gp")
    s0, s1 = _checksums(outs)
    assert np.isfinite(s0)
    np.testing.assert_allclose(s0, s1, rtol=1e-12)

    import jax.numpy as jnp
    from glomap_tpu.config import GlobalPositionerOptions
    from glomap_tpu.estimators.global_positioning import \
        solve_global_positioning
    from glomap_tpu.parallel import mesh as meshmod
    from tests.multihost_worker import make_problem

    scene, vg, tracks = make_problem()
    opts = GlobalPositionerOptions()
    opts.max_num_iterations = 60
    mesh = meshmod.make_mesh(8, axis="part")
    assert solve_global_positioning(scene, vg, tracks, opts,
                                    dtype=jnp.float64, mesh=mesh)
    ref = float(np.sum(scene.frame_trans)) + \
        float(np.sum(tracks.xyz[tracks.valid]))
    np.testing.assert_allclose(ref, s0, rtol=1e-6)


def test_two_process_sharded_ra():
    """Edge-sharded rotation averaging over the 2-process global mesh
    (partition-aware placement + exact ADMM L1 phase)."""
    outs = _run_workers(2, mode="ra")
    s0, s1 = _checksums(outs)
    assert np.isfinite(s0)
    np.testing.assert_allclose(s0, s1, rtol=1e-12)

    import jax.numpy as jnp
    from glomap_tpu.parallel import mesh as meshmod
    from glomap_tpu.parallel.sharded_ra import solve_rotations_sharded
    from tests.multihost_worker import make_problem

    scene, vg, tracks = make_problem()
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    mesh = meshmod.make_mesh(8, axis="part")
    assert solve_rotations_sharded(scene, vg, mesh, dtype=jnp.float64)
    ref = float(np.sum(np.abs(scene.frame_quat)))
    np.testing.assert_allclose(ref, s0, rtol=1e-6)


def test_two_process_full_mapper(tmp_path):
    """FULL mapper (RA + GP + staged BA on the global mesh) across 2
    processes: each process writes the model it observed; the two written
    model directories must match BIT-FOR-BIT (host-side plans and
    fetched global arrays are identical in every process)."""
    outs = _run_workers(2, mode="mapper", out_dir=str(tmp_path))
    digests = []
    for out in outs:
        m = re.search(r"MH_RESULT digest=(\S+) reg=(\d+) tracks=(\d+)",
                      out)
        assert m, f"no result line in worker output:\n{out[-3000:]}"
        digests.append((m.group(1), int(m.group(2)), int(m.group(3))))
    (d0, r0, t0), (d1, r1, t1) = digests
    assert r0 == r1 and r0 > 0
    assert t0 == t1 and t0 > 0
    assert d0 == d1, "written models differ between processes"
