"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax

from glomap_tpu.config import BundleAdjusterOptions
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.parallel import mesh as meshmod
from glomap_tpu.parallel.sharded_ba import solve_ba_sharded
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset
from tests.test_bundle_adjustment import _prepare, _pose_errors


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=100),
        pose_noise=0.01, point_noise=0.05)
    scene8 = scene.copy()
    tracks8 = tracks.copy()

    # single device (first CPU device only)
    mesh1 = meshmod.make_mesh(1)
    import jax.numpy as jnp
    cost1, it1 = solve_ba_sharded(scene, tracks, mesh1, dtype=jnp.float64)

    # all 8 virtual devices
    mesh8 = meshmod.make_mesh(8)
    cost8, it8 = solve_ba_sharded(scene8, tracks8, mesh8, dtype=jnp.float64)

    assert np.isfinite(cost1) and np.isfinite(cost8)
    # same optimization on sharded data: costs agree tightly
    assert abs(cost1 - cost8) / max(cost1, 1e-12) < 1e-4

    c_err1, r_err1 = _pose_errors(scene, gt)
    c_err8, r_err8 = _pose_errors(scene8, gt)
    assert r_err1.max() < 1e-2 and r_err8.max() < 1e-2
    assert c_err1.max() < 1e-3 and c_err8.max() < 1e-3
