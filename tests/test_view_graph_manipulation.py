"""View-graph preprocessing: H decomposition + pure-rotation handling
(counterpart of view_graph_manipulation.cc:240-313 semantics)."""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm
from glomap_tpu.math import two_view as tv
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.processors.view_graph_manipulation import decompose_rel_pose
from glomap_tpu.scene.view_graph import (CONFIG_CALIBRATED,
                                         CONFIG_PANORAMIC,
                                         CONFIG_PLANAR_OR_PANORAMIC)
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _gt_rel_pose(scene, gt, vg, p):
    qi = gt["frame_quat"][scene.image_frame[vg.pair_i[p]]]
    ti = gt["frame_trans"][scene.image_frame[vg.pair_i[p]]]
    qj = gt["frame_quat"][scene.image_frame[vg.pair_j[p]]]
    tj = gt["frame_trans"][scene.image_frame[vg.pair_j[p]]]
    q_rel = rotm.quat_mul(qj, rotm.quat_conj(qi))
    t_rel = tj - np.asarray(rotm.quat_rotate(q_rel, ti))
    return np.asarray(q_rel), np.asarray(t_rel)


def _set_pair_H(scene, vg, p, q_rel, t_rel, n_cam1, d):
    ci = scene.image_camera[vg.pair_i[p]]
    cj = scene.image_camera[vg.pair_j[p]]
    K1i = np.asarray(tv.calib_matrix_inv(*scene.cam_params[ci, 0:4]))
    K2 = np.asarray(tv.calib_matrix(*scene.cam_params[cj, 0:4]))
    R = np.asarray(rotm.quat_to_rotmat(jnp.asarray(q_rel[None])))[0]
    H_cal = R + np.outer(t_rel, n_cam1) / d
    vg.pair_H[p] = K2 @ H_cal @ K1i
    vg.pair_config[p] = CONFIG_PLANAR_OR_PANORAMIC
    # wreck the stored pose: decompose must recover it from H
    vg.pair_quat[p] = [1.0, 0, 0, 0]
    vg.pair_trans[p] = 0.0


def test_planar_pair_pose_from_homography():
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=8, num_points3D=120, seed=11))
    undistort_images(scene)
    p = int(np.nonzero(vg.pair_valid)[0][3])
    q_rel, t_rel = _gt_rel_pose(scene, gt, vg, p)
    # plane in front of BOTH cameras: d must exceed the baseline so
    # det(R + t n^T/d) = 1 + n.R^T t / d stays positive (a physically
    # valid plane-induced homography)
    n1 = np.array([0.2, -0.1, 1.0])
    n1 /= np.linalg.norm(n1)
    _set_pair_H(scene, vg, p, q_rel, t_rel, n1,
                d=4.0 * np.linalg.norm(t_rel))

    n_pure = decompose_rel_pose(scene, vg)
    assert n_pure == 0
    assert vg.pair_config[p] == CONFIG_CALIBRATED
    ang = np.degrees(float(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(vg.pair_quat[p][None]), jnp.asarray(q_rel[None])))[0]))
    assert ang < 0.1
    t_dir = t_rel / np.linalg.norm(t_rel)
    cos = float(np.dot(vg.pair_trans[p], t_dir))
    assert cos > 0.999  # direction recovered incl. cheirality sign


def test_panoramic_pair_reclassified_pure_rotation():
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=8, num_points3D=120, seed=12))
    undistort_images(scene)
    p = int(np.nonzero(vg.pair_valid)[0][5])
    q_rel, _ = _gt_rel_pose(scene, gt, vg, p)
    # pure-rotation homography (no translation component)
    _set_pair_H(scene, vg, p, q_rel, np.zeros(3), np.array([0, 0, 1.0]),
                d=1.0)

    n_pure = decompose_rel_pose(scene, vg)
    assert n_pure == 1
    assert vg.pair_config[p] == CONFIG_PANORAMIC
    np.testing.assert_allclose(vg.pair_trans[p], 0.0, atol=1e-12)
    ang = np.degrees(float(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(vg.pair_quat[p][None]), jnp.asarray(q_rel[None])))[0]))
    assert ang < 0.1


def test_panoramic_pairs_excluded_from_gp_cc_constraints():
    """GP camera-to-camera constraints must skip zero-translation pairs."""
    from glomap_tpu.config import GlobalPositionerOptions
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.estimators.global_positioning import (
        solve_global_positioning)

    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=10, num_points3D=150, seed=13))
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    # poison two pairs as panoramic with zero translation
    idx = np.nonzero(vg.pair_valid)[0][:2]
    vg.pair_config[idx] = CONFIG_PANORAMIC
    vg.pair_trans[idx] = 0.0
    scene.frame_quat = gt["frame_quat"].copy()
    opts = GlobalPositionerOptions(
        constraint_type="POINTS_AND_CAMERAS_BALANCED")
    assert solve_global_positioning(scene, vg, tracks, opts)
    assert np.all(np.isfinite(scene.frame_trans))
