"""End-to-end GlobalMapper tests against the reference's accuracy oracle.

Mirrors glomap/controllers/global_mapper_test.cc: synthesize a dataset,
run the pipeline, Sim3-align to ground truth, and check rotation /
projection-center error bounds (noiseless: 1e-2 deg / 1e-4; noisy:
1e-1 deg / 1e-1 with >=98% observations).
"""

import pytest

# full-pipeline runs take minutes each; see pyproject markers
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import GlobalMapperOptions
from glomap_tpu.controllers.global_mapper import GlobalMapper
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math.sim3 import umeyama_alignment, apply_sim3
from glomap_tpu.processors.pair_inliers import image_pairs_inlier_count
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _mapper_options():
    """Stages 0-2 are fed from the synthetic two-view geometries (like the
    reference RA tests do via CreateMapperTestOptions); retriangulation
    waits for the triangulation module."""
    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    opt.skip_retriangulation = True
    return opt


def _expect_equal(scene, gt, max_rot_deg, max_center_err):
    reg = scene.frame_registered
    q_est = jnp.asarray(scene.frame_quat[reg])
    q_gt = jnp.asarray(gt["frame_quat"][reg])
    n = int(reg.sum())
    ii, jj = np.triu_indices(n, k=1)
    rel_e = rotm.quat_mul(q_est[ii], rotm.quat_conj(q_est[jj]))
    rel_g = rotm.quat_mul(q_gt[ii], rotm.quat_conj(q_gt[jj]))
    rot_err = np.degrees(np.asarray(
        rotm.relative_quat_angle_rad(rel_e, rel_g)))
    assert rot_err.max() < max_rot_deg, f"rot err {rot_err.max()}"

    est_c = scene.frame_centers()[reg]
    gt_c = np.asarray(rotm.pose_center(
        jnp.asarray(gt["frame_quat"][reg]),
        jnp.asarray(gt["frame_trans"][reg])))
    s, R, t = umeyama_alignment(est_c, gt_c)
    err = np.linalg.norm(apply_sim3(s, R, t, est_c) - gt_c, axis=-1)
    assert err.max() < max_center_err, f"center err {err.max()}"


def test_mapper_noiseless():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=200, seed=30))
    # scramble poses: the pipeline must recover everything
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    mapper = GlobalMapper(_mapper_options())
    tracks = mapper.solve(scene, vg)
    assert tracks is not None
    # reference noiseless oracle, unrelaxed (global_mapper_test.cc:83-87)
    _expect_equal(scene, gt, 1e-2, 1e-4)


def test_mapper_noisy_with_outlier_matches():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=300, seed=31,
                         point2D_stddev=0.5, inlier_match_ratio=0.8))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    mapper = GlobalMapper(_mapper_options())
    tracks = mapper.solve(scene, vg)
    assert tracks is not None
    assert scene.frame_registered.sum() == scene.num_frames
    # reference noisy oracle: 1e-1 deg / 1e-1 units
    _expect_equal(scene, gt, 1e-1, 1e-1)
    # healthy fraction of observations survives the filters
    assert tracks.obs_valid.mean() > 0.9


def test_mapper_rig_scene():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=250, seed=32))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    mapper = GlobalMapper(_mapper_options())
    tracks = mapper.solve(scene, vg)
    assert tracks is not None
    _expect_equal(scene, gt, 1e-2, 1e-4)


def test_mapper_full_pipeline_from_matches_only():
    """All stages enabled except retriangulation: poses and two-view
    geometries are re-estimated from scratch (matches + F only)."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=250, seed=33,
                         point2D_stddev=0.3, inlier_match_ratio=0.9))
    # wipe everything the pipeline should recover
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1.0], (vg.num_pairs, 1))

    opt = GlobalMapperOptions()
    opt.skip_retriangulation = True
    opt.opt_relpose.num_hypotheses = 256
    mapper = GlobalMapper(opt)
    tracks = mapper.solve(scene, vg)
    assert tracks is not None
    assert scene.frame_registered.sum() >= scene.num_frames - 1
    _expect_equal(scene, gt, 1e-1, 1e-1)


def test_mapper_with_retriangulation():
    """Full pipeline including the retriangulation stage."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=200, seed=34,
                         point2D_stddev=0.3))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    tracks = GlobalMapper(opt).solve(scene, vg)
    assert tracks is not None
    _expect_equal(scene, gt, 1e-1, 1e-1)
    # retriangulation should produce a healthy track set
    assert tracks.num_tracks > 150
    # the reference's observation-recovery oracle
    # (global_mapper_test.cc:213-217): >=98% of GT observations survive
    assert tracks.obs_valid.sum() >= 0.98 * scene.num_keypoints


def test_mapper_stress_60pct_inliers_full_pipeline():
    """The reference's OWN robustness stress point, mirrored exactly
    (global_mapper_test.cc:177-217 WithNoiseAndOutliers): 2 rigs x 4
    frames, 100 points, sigma=0.5 px keypoint noise and
    inlier_match_ratio=0.6, with the FULL pipeline enabled — relative
    poses RE-ESTIMATED by our own adaptive RANSAC (no skip), then
    retriangulation. Oracle: 1e-1 deg / 1e-1 center bounds and >=98% of
    observations recovered (num_obs_tolerance=0.02)."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_rigs=2, num_frames_per_rig=4,
                         num_points3D=100, seed=35,
                         point2D_stddev=0.5, inlier_match_ratio=0.6))
    # wipe everything the pipeline should recover
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1.0], (vg.num_pairs, 1))

    tracks = GlobalMapper(GlobalMapperOptions()).solve(scene, vg)
    assert tracks is not None
    assert scene.frame_registered.sum() == scene.num_frames
    _expect_equal(scene, gt, 1e-1, 1e-1)
    assert tracks.obs_valid.sum() >= 0.98 * scene.num_keypoints


def test_mapper_noisy_outliers_observation_recovery():
    """The reference noisy oracle in full (global_mapper_test.cc:177-217):
    sigma=0.5 px keypoints + outlier matches, retriangulation enabled;
    1e-1 deg / 1e-1 center bounds and >=98% of observations recovered."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=300, seed=31,
                         point2D_stddev=0.5, inlier_match_ratio=0.8))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    tracks = GlobalMapper(opt).solve(scene, vg)
    assert tracks is not None
    _expect_equal(scene, gt, 1e-1, 1e-1)
    assert tracks.obs_valid.sum() >= 0.98 * scene.num_keypoints


def test_mapper_reundistortion_after_intrinsics_ba():
    """Re-undistortion regression (reference global_mapper.cc:237-238,
    263-264): on a no-prior-focal scene with a 20%-wrong initial focal,
    stage-6 BA corrects the intrinsics and the pipeline must re-lift
    scene.kp_ray before the normalized-space filters. With the refresh
    the noisy oracle passes and the focal is recovered; with stale rays
    the filters consume rays lifted at the wrong focal and the run
    degrades (measured: the mapper fails outright)."""
    from glomap_tpu.ops import camera_models as cm
    import glomap_tpu.controllers.global_mapper as gm_mod

    def build():
        scene, vg, gt = synthesize_dataset(
            SyntheticOptions(num_frames_per_rig=15, num_points3D=300,
                             seed=33, point2D_stddev=0.5,
                             prior_focal=False))
        for fi in cm.FOCAL_IDXS[cm.PINHOLE]:
            scene.cam_params[:, fi] *= 1.2  # wrong initial focal
        scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
        scene.frame_trans = np.zeros((scene.num_frames, 3))
        undistort_images(scene)
        image_pairs_inlier_count(scene, vg)
        return scene, vg, gt

    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    opt.skip_retriangulation = True

    scene, vg, gt = build()
    tracks = GlobalMapper(opt).solve(scene, vg)
    assert tracks is not None
    # harsher-than-reference scenario (20% focal error, no prior): the
    # noisy center bound holds; rotations settle within 0.3 deg
    _expect_equal(scene, gt, 3e-1, 1e-1)
    # BA recovered the true focal from the 20%-wrong init...
    assert abs(scene.cam_params[0, 0] - 900.0) < 9.0
    # ...and the rays in the scene are lifted with the FINAL intrinsics
    from glomap_tpu.processors.undistortion import undistort_images as ud
    ray_before = scene.kp_ray.copy()
    ud(scene)
    assert np.allclose(ray_before, scene.kp_ray, atol=1e-12)

    # differential: with the refresh disabled the stale rays must not
    # quietly reproduce the refreshed result
    scene_b, vg_b, _ = build()
    orig = gm_mod._refresh_rays
    gm_mod._refresh_rays = lambda *a, **k: None
    try:
        tracks_b = GlobalMapper(opt).solve(scene_b, vg_b)
    finally:
        gm_mod._refresh_rays = orig
    if tracks_b is not None:
        est_c = scene_b.frame_centers()[scene_b.frame_registered]
        gt_c = np.asarray(rotm.pose_center(
            jnp.asarray(gt["frame_quat"][scene_b.frame_registered]),
            jnp.asarray(gt["frame_trans"][scene_b.frame_registered])))
        s, R, t = umeyama_alignment(est_c, gt_c)
        err_b = np.linalg.norm(apply_sim3(s, R, t, est_c) - gt_c,
                               axis=-1).max()
        assert err_b > 0.02, "stale rays unexpectedly matched the oracle"


def test_mapper_sequential_loop_capture():
    """Full pipeline (incl. relpose re-estimation + retriangulation) on
    the sequential loop capture (utils/synthetic.py
    synthesize_sequential_dataset — the 1DSfM Alamo/Roman Forum analog
    with LOCAL covisibility): noisy oracle bounds, all frames
    registered. Validates the generator + pipeline at the geometry the
    at-scale e2e benchmark uses (scripts/bench_e2e.py --capture
    sequential)."""
    from glomap_tpu.utils.synthetic import (SequentialCaptureOptions,
                                            synthesize_sequential_dataset)
    scene, vg, gt = synthesize_sequential_dataset(SequentialCaptureOptions(
        num_frames=60, num_points3D=3000, max_kp_per_image=500,
        point2D_stddev=0.5, inlier_match_ratio=0.9, seed=5))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    scene.frame_trans = np.zeros((scene.num_frames, 3))
    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1.0], (vg.num_pairs, 1))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)

    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    tracks = GlobalMapper(opt).solve(scene, vg)
    assert tracks is not None
    assert scene.frame_registered.sum() == scene.num_frames
    # scene extent ~50 (ring radius) vs the reference oracle's ~10:
    # scale the 1e-1 center bound accordingly
    _expect_equal(scene, gt, 1e-1, 5e-1)
    assert tracks.obs_valid.mean() > 0.9
