"""Batched RANSAC relative pose tests."""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import RelPoseEstimationOptions
from glomap_tpu.estimators.relpose import estimate_relative_poses
from glomap_tpu.math import rotation as rotm
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _pose_errors(vg, gt_quat, gt_trans):
    """(rotation deg, translation-direction deg) errors per pair."""
    rot = np.degrees(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(vg.pair_quat), jnp.asarray(gt_quat))))
    t_est = vg.pair_trans / np.maximum(
        np.linalg.norm(vg.pair_trans, axis=-1, keepdims=True), 1e-12)
    t_gt = gt_trans / np.maximum(
        np.linalg.norm(gt_trans, axis=-1, keepdims=True), 1e-12)
    tdir = np.degrees(np.arccos(np.clip(np.sum(t_est * t_gt, -1), -1, 1)))
    return rot, tdir


def test_relpose_noiseless():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=150, seed=50))
    gt_q = vg.pair_quat.copy()
    gt_t = vg.pair_trans.copy()
    # wipe stored poses; estimator must recover them from matches
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1], (vg.num_pairs, 1))
    undistort_images(scene)
    estimate_relative_poses(scene, vg,
                            RelPoseEstimationOptions(num_hypotheses=256))
    rot, tdir = _pose_errors(vg, gt_q, gt_t)
    assert np.median(rot) < 0.01
    assert rot.max() < 0.5
    assert np.median(tdir) < 0.1
    assert tdir.max() < 2.0


def test_relpose_with_noise_and_outliers():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=250, seed=51,
                         point2D_stddev=0.5, inlier_match_ratio=0.7))
    gt_q = vg.pair_quat.copy()
    gt_t = vg.pair_trans.copy()
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1], (vg.num_pairs, 1))
    undistort_images(scene)
    estimate_relative_poses(scene, vg,
                            RelPoseEstimationOptions(num_hypotheses=512))
    rot, tdir = _pose_errors(vg, gt_q, gt_t)
    # robust medians; a few hard pairs may be off (filtered downstream)
    assert np.median(rot) < 0.5
    assert np.median(tdir) < 2.0
    assert (rot < 2.0).mean() > 0.85
