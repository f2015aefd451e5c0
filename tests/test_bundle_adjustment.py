"""Bundle adjustment tests: pose/intrinsics/point refinement on synthetic."""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import BundleAdjusterOptions
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.estimators.bundle_adjustment import solve_bundle_adjustment
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math.sim3 import umeyama_alignment, apply_sim3
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _prepare(opt, pose_noise=0.01, point_noise=0.05, focal_noise=0.0,
             rng_seed=0):
    scene, vg, gt = synthesize_dataset(opt)
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    rng = np.random.default_rng(rng_seed)
    # init points at GT + noise (triangulation proxy)
    kp_point = gt["kp_point"]
    obs_kp = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
    obs_point_gt = kp_point[obs_kp]
    for t in range(tracks.num_tracks):
        sel = tracks.obs_track == t
        tracks.xyz[t] = gt["points"][obs_point_gt[sel][0]] + \
            point_noise * rng.standard_normal(3)
    # perturb poses
    w = pose_noise * rng.standard_normal((scene.num_frames, 3))
    scene.frame_quat = np.array(rotm.quat_mul(
        jnp.asarray(scene.frame_quat), rotm.so3_exp_quat(jnp.asarray(w))),
        copy=True)
    scene.frame_trans = scene.frame_trans + \
        pose_noise * rng.standard_normal((scene.num_frames, 3))
    if focal_noise:
        scene.cam_params[:, 0] *= 1 + focal_noise
        scene.cam_params[:, 1] *= 1 + focal_noise
    return scene, vg, tracks, gt


def _pose_errors(scene, gt):
    est_c = scene.frame_centers()
    gt_c = np.asarray(rotm.pose_center(jnp.asarray(gt["frame_quat"]),
                                       jnp.asarray(gt["frame_trans"])))
    s, R, t = umeyama_alignment(est_c, gt_c)
    center_err = np.linalg.norm(apply_sim3(s, R, t, est_c) - gt_c, axis=-1)
    # rotation errors via pairwise relative rotations (gauge-free)
    qe = jnp.asarray(scene.frame_quat)
    qg = jnp.asarray(gt["frame_quat"])
    n = scene.num_frames
    ii, jj = np.triu_indices(n, k=1)
    rel_e = rotm.quat_mul(qe[ii], rotm.quat_conj(qe[jj]))
    rel_g = rotm.quat_mul(qg[ii], rotm.quat_conj(qg[jj]))
    rot_err = np.degrees(np.asarray(rotm.relative_quat_angle_rad(rel_e,
                                                                 rel_g)))
    return center_err, rot_err


def test_ba_refines_noiseless_to_exact():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=20))
    assert solve_bundle_adjustment(scene, tracks)
    c_err, r_err = _pose_errors(scene, gt)
    # the reference noiseless oracle: <=1e-2 deg rotation, <=1e-4 centers
    assert r_err.max() < 1e-2
    assert c_err.max() < 1e-4


def test_ba_translation_only_stage():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=21),
        pose_noise=0.005)
    q_before = scene.frame_quat.copy()
    opts = BundleAdjusterOptions(optimize_rotations=False)
    assert solve_bundle_adjustment(scene, tracks, opts)
    np.testing.assert_allclose(scene.frame_quat, q_before, atol=1e-12)


def test_ba_recovers_focal():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=14, num_points3D=200, seed=22,
                         camera_model=2),  # SIMPLE_RADIAL
        pose_noise=0.002, point_noise=0.02, focal_noise=0.05)
    f_gt = 900.0
    assert abs(scene.cam_params[0, 0] - f_gt) > 20  # perturbed
    assert solve_bundle_adjustment(scene, tracks)
    assert abs(scene.cam_params[0, 0] - f_gt) < 2.0
    # tied focal: fx == fy for SIMPLE_RADIAL
    np.testing.assert_allclose(scene.cam_params[:, 0], scene.cam_params[:, 1],
                               atol=1e-9)
    # principal point frozen by default
    np.testing.assert_allclose(scene.cam_params[0, 2:4], [512.0, 384.0],
                               atol=1e-12)


def test_ba_fisheye_fast_path():
    """Fisheye scenes run the Pallas all-kind fast path (no (O, 2, 25)
    jacfwd materialization) and hit the noiseless oracle."""
    from glomap_tpu.estimators.bundle_adjustment import ba_fast_path_ok
    from glomap_tpu.ops import camera_models as cm

    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=150, seed=24,
                         camera_model=cm.OPENCV_FISHEYE,
                         camera_params=(450.0, 450.0, 512.0, 384.0,
                                        0.03, -0.005, 1e-3, -1e-4)))
    assert (scene.cam_kind == 1).all()
    assert ba_fast_path_ok(scene)  # round-1 gap: this used to be False
    assert solve_bundle_adjustment(scene, tracks)
    c_err, r_err = _pose_errors(scene, gt)
    assert r_err.max() < 1e-2
    assert c_err.max() < 1e-4


def test_ba_noisy_keypoints():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=300, seed=23,
                         point2D_stddev=0.5),
        pose_noise=0.01, point_noise=0.05)
    assert solve_bundle_adjustment(scene, tracks)
    c_err, r_err = _pose_errors(scene, gt)
    # reference noisy oracle envelope: <=1e-1 deg / <=1e-1 units
    assert r_err.max() < 1e-1
    assert c_err.max() < 1e-1


def test_ba_rig_scene():
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=250, seed=24),
        pose_noise=0.005, point_noise=0.02)
    assert solve_bundle_adjustment(scene, tracks)
    c_err, r_err = _pose_errors(scene, gt)
    assert r_err.max() < 1e-2
    assert c_err.max() < 1e-3


def test_ba_optimize_rig_poses():
    """optimize_rig_poses refines perturbed sensor_from_rig extrinsics."""
    scene, vg, tracks, gt = _prepare(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=250, seed=25),
        pose_noise=0.0, point_noise=0.01)
    gt_sq = scene.sensor_quat.copy()
    gt_st = scene.sensor_trans.copy()
    # perturb the non-reference sensor extrinsics
    rng = np.random.default_rng(0)
    unk = ~scene.sensor_is_ref
    w = 0.01 * rng.standard_normal((unk.sum(), 3))
    scene.sensor_quat[unk] = np.asarray(rotm.quat_mul(
        jnp.asarray(scene.sensor_quat[unk]), rotm.so3_exp_quat(jnp.asarray(w))))
    scene.sensor_trans[unk] += 0.02 * rng.standard_normal((unk.sum(), 3))

    opts = BundleAdjusterOptions(optimize_rig_poses=True)
    assert solve_bundle_adjustment(scene, tracks, opts)
    ang = np.degrees(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(scene.sensor_quat[unk]), jnp.asarray(gt_sq[unk]))))
    t_err = np.linalg.norm(scene.sensor_trans[unk] - gt_st[unk], axis=-1)
    assert ang.max() < 0.02
    assert t_err.max() < 5e-3
    # reference sensors untouched
    np.testing.assert_allclose(scene.sensor_quat[~unk], gt_sq[~unk])


def test_ba_cg_forcing_tolerance_accuracy():
    """The inexact-Newton forcing default (cg_relative_tolerance = 1e-2,
    cf. Ceres ITERATIVE_SCHUR eta = 1e-1) must reach the same optimum as
    a tight-tolerance solve on an oracle scene — the LM outer loop
    absorbs the linear-solve error (advisor round-2 ask)."""
    def run(tol):
        scene, vg, tracks, gt = _prepare(
            SyntheticOptions(num_frames_per_rig=10, num_points3D=120,
                             seed=21, point2D_stddev=0.3))
        opts = BundleAdjusterOptions()
        opts.cg_relative_tolerance = tol
        assert solve_bundle_adjustment(scene, tracks, opts)
        return scene, tracks

    def cost_of(scene, tracks):
        from glomap_tpu.processors.track_filter import _obs_geometry
        pt_cam, ray, _ = _obs_geometry(scene, tracks)
        z = np.maximum(pt_cam[..., 2], 1e-12)
        proj = pt_cam[..., :2] / z[..., None]
        feat = ray[..., :2] / (ray[..., 2:3] + 1e-12)
        r2 = np.sum((proj - feat) ** 2, axis=-1)[tracks.obs_valid]
        d = 1e-2  # Huber knee (normalized units)
        r = np.sqrt(r2)
        return float(np.sum(np.where(r <= d, r2, 2 * d * r - d * d)))

    s_loose, t_loose = run(1e-2)
    s_tight, t_tight = run(1e-5)
    # both reach the same optimum VALUE (individual parameters may land
    # in equivalent nearby optima within the noise envelope)
    c_loose = cost_of(s_loose, t_loose)
    c_tight = cost_of(s_tight, t_tight)
    assert abs(c_loose - c_tight) <= 1e-3 * max(c_tight, 1e-12), \
        (c_loose, c_tight)
    # and the mutual solution difference stays far below the noise scale
    d = np.linalg.norm(s_loose.frame_trans - s_tight.frame_trans, axis=-1)
    assert d.max() < 1e-2


def test_segmented_ba_matches_single_call():
    """Host-segmented BA (bounded-duration device calls with carried LM
    damping — the tunneled chip kills single XLA executions >~60-90 s)
    must reach the same optimum as the single-call path."""
    import glomap_tpu.estimators.bundle_adjustment as ba
    from glomap_tpu.config import BundleAdjusterOptions
    from glomap_tpu.estimators.bundle_adjustment import (
        solve_bundle_adjustment)
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                            synthesize_dataset)
    import copy

    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=12, num_points3D=150, seed=21,
        point2D_stddev=0.5))
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    triangulate_tracks(scene, tracks)
    s1, t1 = copy.deepcopy(scene), tracks.copy()
    s2, t2 = copy.deepcopy(scene), tracks.copy()
    opts = BundleAdjusterOptions()
    opts.max_num_iterations = 40
    assert solve_bundle_adjustment(s1, t1, opts)
    old = ba._SEGMENT_TARGET_S
    try:
        ba._SEGMENT_TARGET_S = 1e-9  # force seg = 5 -> several segments
        assert solve_bundle_adjustment(s2, t2, opts)
    finally:
        ba._SEGMENT_TARGET_S = old
    # same optimum (paths may differ at segment boundaries)
    d = np.linalg.norm(s1.frame_trans - s2.frame_trans, axis=-1)
    assert d.max() < 1e-3, d.max()
    np.testing.assert_allclose(t1.xyz, t2.xyz, atol=1e-3)


def test_segmented_gp_matches_single_call():
    """Same bounded-duration segmentation for global positioning."""
    import glomap_tpu.estimators.global_positioning as gp
    from glomap_tpu.config import GlobalPositionerOptions
    from glomap_tpu.estimators.global_positioning import (
        solve_global_positioning)
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.utils.synthetic import (SyntheticOptions,
                                            synthesize_dataset)
    import copy

    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=12, num_points3D=150, seed=22))
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    s1, t1 = copy.deepcopy(scene), tracks.copy()
    s2, t2 = copy.deepcopy(scene), tracks.copy()
    assert solve_global_positioning(s1, vg, t1, GlobalPositionerOptions())
    old = gp._SEGMENT_TARGET_S
    try:
        gp._SEGMENT_TARGET_S = 1e-9
        assert solve_global_positioning(s2, vg, t2,
                                        GlobalPositionerOptions())
    finally:
        gp._SEGMENT_TARGET_S = old
    d = np.linalg.norm(s1.frame_centers() - s2.frame_centers(), axis=-1)
    assert d.max() < 1e-2, d.max()
