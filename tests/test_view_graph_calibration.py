"""View-graph calibration (Fetzer focal) + preprocessing tests."""

import numpy as np

from glomap_tpu.config import ViewGraphCalibratorOptions
from glomap_tpu.estimators.view_graph_calibration import calibrate_view_graph
from glomap_tpu.processors.view_graph_manipulation import (
    decompose_rel_pose, update_image_pairs_config, sparsify_graph)
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.scene.view_graph import CONFIG_UNCALIBRATED
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset
from glomap_tpu.math import rotation as rotm
import jax.numpy as jnp


def test_focal_recovered_from_fundamental_matrices():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=60))
    f_gt = scene.cam_params[0, 0]
    # pretend the focal is unknown and badly initialized
    scene.cam_has_prior_focal[:] = False
    scene.cam_params[:, 0] = 1.3 * f_gt
    scene.cam_params[:, 1] = 1.3 * f_gt
    vg.pair_config[:] = CONFIG_UNCALIBRATED
    assert calibrate_view_graph(scene, vg)
    assert abs(scene.cam_params[0, 0] - f_gt) / f_gt < 0.01
    # all pairs consistent -> none invalidated
    assert vg.pair_valid.all()


def test_prior_focal_cameras_stay_fixed():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=120, seed=61))
    before = scene.cam_params.copy()
    assert calibrate_view_graph(scene, vg)
    np.testing.assert_allclose(scene.cam_params, before)


def test_degenerate_estimates_rejected():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=120, seed=62))
    scene.cam_has_prior_focal[:] = False
    f_gt = scene.cam_params[0, 0]
    # init 20x too large: estimate/init ratio will exceed thres, keep init
    scene.cam_params[:, 0:2] = 20 * f_gt
    opts = ViewGraphCalibratorOptions(thres_lower_ratio=0.9,
                                      thres_higher_ratio=1.1)
    assert calibrate_view_graph(scene, vg, opts)
    # rejected -> focal unchanged
    np.testing.assert_allclose(scene.cam_params[0, 0], 20 * f_gt)


def test_decompose_rel_pose_recovers_pose():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=150, seed=63))
    gt_q = vg.pair_quat.copy()
    gt_t = vg.pair_trans.copy()
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.zeros((vg.num_pairs, 3))
    undistort_images(scene)
    decompose_rel_pose(scene, vg)
    rot = np.degrees(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(vg.pair_quat), jnp.asarray(gt_q))))
    assert rot.max() < 1e-4
    t_gt = gt_t / np.linalg.norm(gt_t, axis=-1, keepdims=True)
    tdir = np.degrees(np.arccos(np.clip(
        np.sum(vg.pair_trans * t_gt, -1), -1, 1)))
    assert tdir.max() < 1e-3


def test_update_config_and_sparsify():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=64))
    n = vg.num_pairs
    # mark a minority of pairs uncalibrated; cameras majority-calibrated
    vg.pair_config[:: 5] = CONFIG_UNCALIBRATED
    promoted = update_image_pairs_config(scene, vg)
    assert promoted == (n + 4) // 5
    assert (vg.pair_config == 2).all()

    dropped = sparsify_graph(vg, scene, expected_degree=4)
    assert dropped > 0
    assert vg.pair_valid.sum() < n
