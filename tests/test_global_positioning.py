"""Global positioning tests: recover camera centers + points up to Sim3."""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import GlobalPositionerOptions
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.estimators.global_positioning import solve_global_positioning
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math.sim3 import umeyama_alignment, apply_sim3
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _prepare(opt):
    scene, vg, gt = synthesize_dataset(opt)
    undistort_images(scene)
    tracks_full = establish_full_tracks(scene, vg)
    tracks = find_tracks_for_problem(scene, tracks_full)
    # rotations assumed known (GP runs after rotation averaging)
    return scene, vg, tracks, gt


def _center_errors(scene, gt):
    est = scene.frame_centers()
    gt_c = np.asarray(rotm.pose_center(jnp.asarray(gt["frame_quat"]),
                                       jnp.asarray(gt["frame_trans"])))
    s, R, t = umeyama_alignment(est, gt_c)
    est_aligned = apply_sim3(s, R, t, est)
    return np.linalg.norm(est_aligned - gt_c, axis=-1)


def test_noiseless_recovers_centers():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=200, seed=13))
    assert solve_global_positioning(scene, vg, tracks)
    errs = _center_errors(scene, gt)
    # scene extent ~10; GP alone at the reference's 100-iteration budget
    # (the 1e-4 end-to-end oracle applies after BA)
    assert errs.max() < 5e-3


def test_noisy_keypoints():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=300, seed=14,
                         point2D_stddev=1.0))
    assert solve_global_positioning(scene, vg, tracks)
    errs = _center_errors(scene, gt)
    # cameras on a ring of radius 5: sub-1% of extent expected
    assert errs.max() < 0.15


def test_only_cameras_mode():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=200, seed=15))
    opts = GlobalPositionerOptions(constraint_type="ONLY_CAMERAS")
    assert solve_global_positioning(scene, vg, tracks, opts)
    errs = _center_errors(scene, gt)
    assert errs.max() < 5e-3


def test_points_recovered_too():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=200, seed=16))
    assert solve_global_positioning(scene, vg, tracks)
    # align on centers, then check points fall near their GT points
    est = scene.frame_centers()
    gt_c = np.asarray(rotm.pose_center(jnp.asarray(gt["frame_quat"]),
                                       jnp.asarray(gt["frame_trans"])))
    s, R, t = umeyama_alignment(est, gt_c)
    kp_point = gt["kp_point"]
    obs_kp = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
    obs_point = kp_point[obs_kp]
    ok = 0
    tot = 0
    for tr in range(tracks.num_tracks):
        if not tracks.valid[tr]:
            continue
        pts = obs_point[tracks.obs_track == tr]
        gt_pt = gt["points"][pts[0]]
        est_pt = apply_sim3(s, R, t, tracks.xyz[tr])
        tot += 1
        if np.linalg.norm(est_pt - gt_pt) < 2e-2:
            ok += 1
    assert tot > 100
    assert ok / tot > 0.99


def test_rig_offsets_respected():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=250, seed=17))
    assert solve_global_positioning(scene, vg, tracks)
    errs = _center_errors(scene, gt)
    assert errs.max() < 1e-3


def test_unknown_rig_translations_estimated():
    """Unknown cam_from_rig translations recovered by the GP alternation
    (reference RigUnknownBATAPairwiseDirectionError counterpart)."""
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=250, seed=18))
    gt_st = scene.sensor_trans.copy()
    unk = ~scene.sensor_is_ref
    scene.sensor_known[unk] = False
    scene.sensor_trans[unk] = 0.0  # pretend unknown

    assert solve_global_positioning(scene, vg, tracks)
    errs = _center_errors(scene, gt)
    assert errs.max() < 1e-2
    # sensor translations recovered (up to the global scale of the
    # reconstruction, which is metric-free for unknown rigs; compare
    # directions and relative magnitude)
    est = scene.sensor_trans[unk]
    ratio = np.linalg.norm(est, axis=-1) / np.maximum(
        np.linalg.norm(gt_st[unk], axis=-1), 1e-12)
    # consistent scale across sensors
    assert ratio.std() / max(ratio.mean(), 1e-12) < 0.05
    cosang = np.sum(est * gt_st[unk], axis=-1) / np.maximum(
        np.linalg.norm(est, axis=-1) * np.linalg.norm(gt_st[unk], axis=-1),
        1e-12)
    assert cosang.min() > 0.999
