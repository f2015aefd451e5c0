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


def test_adaptive_budget_per_pair_stopping_numbers():
    """The PoseLib-parity adaptive budget (relpose_estimation.h:14):
    high-inlier pairs stop near the per-pair minimum, pairs with planted
    low inlier ratios run on toward their RANSAC stopping number
    N = log(1-conf)/log(1-r^8), and ineligible pairs (invalid, or < 8
    matches) spend NOTHING. Regression net for the budget logic that the
    e2e oracles absorb silently."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=250, seed=52))
    gt_q = vg.pair_quat.copy()
    rng = np.random.default_rng(0)

    # plant ~55% outlier matches into a subset of pairs: r ~ 0.45 makes
    # the stopping number thousands of hypotheses (0.45^8 ~ 1.7e-3)
    n_corrupt = max(vg.num_pairs // 5, 1)
    corrupt = rng.choice(vg.num_pairs, n_corrupt, replace=False)
    kp_counts = np.diff(scene.kp_offset)
    for p in corrupt:
        sl = vg.match_slice(int(p))
        m2 = vg.match_f2[sl].copy()
        sel = rng.random(len(m2)) < 0.55
        m2[sel] = rng.integers(0, kp_counts[vg.pair_j[p]], int(sel.sum()))
        vg.match_f2[sl] = m2
    # one pair invalid: must never enter the hypothesis loop
    invalid_pair = int([p for p in range(vg.num_pairs)
                        if p not in corrupt][0])
    vg.pair_valid[invalid_pair] = False

    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1], (vg.num_pairs, 1))
    undistort_images(scene)
    opts = RelPoseEstimationOptions(num_hypotheses=256)
    estimate_relative_poses(scene, vg, opts)

    budget = vg._relpose_budget
    assert budget[invalid_pair] == 0, "invalid pair burned budget"

    clean = np.ones(vg.num_pairs, dtype=bool)
    clean[corrupt] = False
    clean[invalid_pair] = False
    # near-noiseless pairs converge quickly: within a few sync strides
    # of the per-pair minimum (chunks between host syncs may overshoot)
    assert np.median(budget[clean]) <= 4 * opts.num_hypotheses
    # planted low-ratio pairs must spend materially more than clean ones
    assert np.median(budget[corrupt]) >= 2 * np.median(budget[clean])
    # and never materially exceed the reference 50k cap (spend is
    # chunk-granular: a pair can overshoot by at most the in-flight
    # chunks of one sync stride)
    assert budget.max() <= opts.max_iterations + 4 * 4 * 256

    # clean-pair accuracy unaffected by the corrupted neighbors
    rot = np.degrees(np.asarray(rotm.relative_quat_angle_rad(
        jnp.asarray(vg.pair_quat[clean]), jnp.asarray(gt_q[clean]))))
    assert np.median(rot) < 0.05


def test_pairs_with_too_few_matches_skip_hypothesis_loop():
    """< 8 matches cannot seed the 8-point solver; such pairs are
    excluded from the active set up front."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=8, num_points3D=150, seed=53))
    # truncate one pair's matches below 8 by masking via pair offsets:
    # emulate by marking it valid but tiny through score-cap table
    # (counts = min(total, cap)); easiest honest construction is a pair
    # whose matches are few in the database — rebuild the flat arrays
    p_small = 0
    sl = vg.match_slice(p_small)
    keep = np.ones(vg.num_matches, dtype=bool)
    keep[sl.start + 5:sl.stop] = False  # leave 5 matches
    vg.match_pair = vg.match_pair[keep]
    vg.match_f1 = vg.match_f1[keep]
    vg.match_f2 = vg.match_f2[keep]
    vg.match_inlier = vg.match_inlier[keep]
    counts = np.bincount(vg.match_pair, minlength=vg.num_pairs)
    vg.pair_match_offset = np.concatenate(
        [[0], np.cumsum(counts)]).astype(np.int64)

    vg.pair_quat = np.tile([1.0, 0, 0, 0], (vg.num_pairs, 1))
    vg.pair_trans = np.tile([0.0, 0, 1], (vg.num_pairs, 1))
    undistort_images(scene)
    estimate_relative_poses(scene, vg,
                            RelPoseEstimationOptions(num_hypotheses=256))
    assert vg._relpose_budget[p_small] == 0
    assert (vg._relpose_budget[1:] > 0).all()


def test_inlier_sweep_chunked_matches_single_shot():
    """The chunked sweep (pair-aligned windows through one compiled
    graph — the 47.7M-match monolithic sweep OOM'd the 16 GB chip) must
    reproduce the single-shot classification bit-for-bit."""
    import copy
    import glomap_tpu.processors.pair_inliers as pi
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.utils.synthetic import (SequentialCaptureOptions,
                                            synthesize_sequential_dataset)

    scene, vg, gt = synthesize_sequential_dataset(SequentialCaptureOptions(
        num_frames=40, num_points3D=2000, max_kp_per_image=400,
        point2D_stddev=0.5, inlier_match_ratio=0.85, seed=6))
    undistort_images(scene)
    vg1 = copy.deepcopy(vg)
    s1 = pi.image_pairs_inlier_count(scene, vg1)
    vg2 = copy.deepcopy(vg)
    old = pi._SWEEP_CHUNK_MATCHES
    try:
        pi._SWEEP_CHUNK_MATCHES = 12000  # force several chunks
        s2 = pi.image_pairs_inlier_count(scene, vg2)
    finally:
        pi._SWEEP_CHUNK_MATCHES = old
    assert vg.num_matches > 36000  # actually chunked
    np.testing.assert_array_equal(vg1.match_inlier, vg2.match_inlier)
    np.testing.assert_array_equal(vg1.pair_num_inliers,
                                  vg2.pair_num_inliers)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-9)
