"""Multi-view triangulation: midpoint and per-track RANSAC.

Covers the TPU-native counterpart of the colmap triangulation machinery
the reference invokes during retriangulation
(glomap/controllers/track_retriangulation.cc:63-80).
"""

import numpy as np

from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.config import TrackEstablishmentOptions
from glomap_tpu.ops.triangulation import (ransac_triangulate_tracks,
                                          triangulate_tracks)
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _gt_scene_tracks(seed=3, noise=0.0):
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=12, num_points3D=150, seed=seed,
        point2D_stddev=noise))
    undistort_images(scene)
    # ground-truth poses are already in the scene right after synthesis
    tracks = find_tracks_for_problem(
        scene, establish_full_tracks(scene, vg),
        TrackEstablishmentOptions(min_num_tracks_per_view=1000))
    return scene, gt, tracks


def _match_gt(tracks, gt_points, atol):
    """Each triangulated track must be near SOME ground-truth point."""
    d = np.linalg.norm(tracks.xyz[:, None, :] - gt_points[None], axis=-1)
    return d.min(axis=1) < atol


def test_midpoint_matches_ground_truth():
    scene, gt, tracks = _gt_scene_tracks()
    ok = triangulate_tracks(scene, tracks)
    assert ok.sum() > 50
    near = _match_gt(tracks, gt["points"], 1e-6)
    assert near[ok].all()


def test_ransac_matches_ground_truth_clean():
    scene, gt, tracks = _gt_scene_tracks()
    ok = ransac_triangulate_tracks(scene, tracks)
    assert ok.sum() > 50
    near = _match_gt(tracks, gt["points"], 1e-5)
    assert near[ok].all()
    # no inlier observations were dropped on clean data
    assert tracks.obs_valid.all()


def test_ransac_rejects_outlier_observations():
    scene, gt, tracks = _gt_scene_tracks()
    rng = np.random.default_rng(0)
    # corrupt 25% of observations of long tracks by pointing them at a
    # different (wrong) feature in the same image
    lens = tracks.track_lengths()
    long_tracks = set(np.nonzero(lens >= 6)[0])
    corrupt = []
    for o in range(tracks.num_obs):
        if tracks.obs_track[o] in long_tracks and rng.random() < 0.25:
            img = tracks.obs_image[o]
            n_feat = int(scene.kp_offset[img + 1] - scene.kp_offset[img])
            shift = int(rng.integers(1, n_feat))
            tracks.obs_feature[o] = (tracks.obs_feature[o] + shift) % n_feat
            corrupt.append(o)
    corrupt = np.asarray(corrupt)
    assert len(corrupt) > 50

    # plain midpoint drags points off ground truth
    mid = tracks.copy()
    ok_mid = triangulate_tracks(scene, mid)
    near_mid = _match_gt(mid, gt["points"], 1e-4)
    affected = np.unique(tracks.obs_track[corrupt])
    assert not near_mid[ok_mid & np.isin(np.arange(mid.num_tracks),
                                         affected)].all()

    # RANSAC recovers the consensus point and masks the corrupt obs
    ok = ransac_triangulate_tracks(scene, tracks)
    d_ransac = np.linalg.norm(tracks.xyz[:, None, :] - gt["points"][None],
                              axis=-1).min(axis=1)
    d_mid = np.linalg.norm(mid.xyz[:, None, :] - gt["points"][None],
                           axis=-1).min(axis=1)
    long_ok = ok & (lens >= 6)
    aff = long_ok & np.isin(np.arange(tracks.num_tracks), affected)
    # consensus point: most tracks exact, the rest bounded by the 2-deg
    # support cone (a corrupt ray inside the cone is legitimately kept —
    # colmap's create_max_angle_error behaves identically); midpoint
    # over all obs has no such bound
    assert (d_ransac[long_ok] < 1e-4).mean() > 0.9
    assert d_ransac[long_ok].max() < 0.3
    assert np.median(d_ransac[aff]) < 0.02 * np.median(d_mid[aff])
    # corrupt observations outside the support cone of successfully
    # triangulated tracks must be flagged as outliers
    dropped = ~tracks.obs_valid[corrupt]
    in_long_ok = long_ok[tracks.obs_track[corrupt]]
    assert dropped[in_long_ok].mean() > 0.85


def test_ransac_noisy_observations_survive():
    scene, gt, tracks = _gt_scene_tracks(noise=0.5)
    ok = ransac_triangulate_tracks(scene, tracks)
    assert ok.sum() > 50
    near = _match_gt(tracks, gt["points"], 0.05)
    assert near[ok].mean() > 0.95
    # noise within the angular threshold must not be masked out
    assert tracks.obs_valid.mean() > 0.95


def test_sorted_paths_match_fallback_on_cpu():
    """The TPU sorted-window paths in midpoint/ransac triangulation are
    gated on _on_tpu(); run them here in Pallas interpret mode
    (force_sorted) and assert equivalence with the segment_sum fallback
    so the two branches cannot silently diverge (advisor round 4)."""
    import jax.numpy as jnp
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    from glomap_tpu.ops.triangulation import (midpoint_triangulate,
                                              ransac_triangulate)
    rng = np.random.default_rng(7)
    T = 37
    lens = rng.integers(0, 9, T)
    lens[::5] = 0  # empty segments interleaved
    ot = np.repeat(np.arange(T, dtype=np.int32), lens)
    O = len(ot)
    d = rng.standard_normal((O, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = rng.standard_normal((O, 3)).astype(np.float32)
    w = rng.random(O).astype(np.float32)
    width = block_width_for_sorted(ot)
    assert width > 0
    X0, ok0 = midpoint_triangulate(jnp.asarray(ot), jnp.asarray(d),
                                   jnp.asarray(c), jnp.asarray(w), T,
                                   sorted_width=0)
    X1, ok1 = midpoint_triangulate(jnp.asarray(ot), jnp.asarray(d),
                                   jnp.asarray(c), jnp.asarray(w), T,
                                   sorted_width=width, force_sorted=True)
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_allclose(np.asarray(X0)[np.asarray(ok0)],
                               np.asarray(X1)[np.asarray(ok0)],
                               rtol=1e-4, atol=1e-5)
    t_len = np.bincount(ot, minlength=T).astype(np.int32)
    t_start = np.concatenate([[0], np.cumsum(t_len)[:-1]]).astype(np.int32)
    args = (jnp.asarray(ot), jnp.asarray(d), jnp.asarray(c),
            jnp.asarray(t_start), jnp.asarray(t_len), T, 8,
            float(np.cos(np.deg2rad(2.0))), float(np.deg2rad(1.0)))
    Xr0, sup0, inl0 = ransac_triangulate(*args, sorted_width=0)
    Xr1, sup1, inl1 = ransac_triangulate(*args, sorted_width=width,
                                         force_sorted=True)
    np.testing.assert_array_equal(np.asarray(sup0), np.asarray(sup1))
    np.testing.assert_array_equal(np.asarray(inl0), np.asarray(inl1))
    np.testing.assert_allclose(np.asarray(Xr0), np.asarray(Xr1),
                               rtol=1e-4, atol=1e-5)


def test_tri_angle_filter_trailing_empty_tracks_regression():
    """Advisor round-4 medium: trailing tracks with zero obs rows made
    the reduceat segment of the LAST populated track truncate its final
    observation (clipped start indices), underestimating max deviation.
    The sorted fast path must match the exact unsorted path exactly."""
    from glomap_tpu.processors.track_filter import (
        filter_tracks_by_triangulation_angle)
    scene, gt, tracks = _gt_scene_tracks()
    triangulate_tracks(scene, tracks)
    # append trailing empty tracks (ids present, zero obs rows — what
    # establish_full_tracks leaves after deleting obs of failed tracks)
    n_extra = 5
    tracks.xyz = np.concatenate([tracks.xyz, np.zeros((n_extra, 3))])
    tracks.valid = np.concatenate([tracks.valid, np.ones(n_extra, bool)])
    t_sorted = tracks.copy()
    t_exact = tracks.copy()
    # exact path: break the sorted invariant with a permutation
    perm = np.random.default_rng(0).permutation(tracks.num_obs)
    t_exact.obs_track = t_exact.obs_track[perm]
    t_exact.obs_image = t_exact.obs_image[perm]
    t_exact.obs_feature = t_exact.obs_feature[perm]
    t_exact.obs_valid = t_exact.obs_valid[perm]
    n_s = filter_tracks_by_triangulation_angle(scene, t_sorted, 1.0)
    n_e = filter_tracks_by_triangulation_angle(scene, t_exact, 1.0)
    assert n_s == n_e
    np.testing.assert_array_equal(t_sorted.valid, t_exact.valid)
    # empty trailing tracks have no pair -> removed, like the reference
    assert not t_sorted.valid[-n_extra:].any()
