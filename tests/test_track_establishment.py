"""Track establishment tests: union-find correctness against GT points."""

import numpy as np

from glomap_tpu import native
from glomap_tpu.config import TrackEstablishmentOptions
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def test_native_lib_builds():
    assert native.get_lib(), "native library should build with g++"


def test_union_find_matches_fallback():
    rng = np.random.default_rng(0)
    num_kp = 500
    kp1 = rng.integers(0, num_kp, 800)
    kp2 = rng.integers(0, num_kp, 800)
    t_native, n_native = native.establish_tracks(num_kp, kp1, kp2)
    t_np, n_np = native._establish_tracks_numpy(num_kp, kp1, kp2)
    assert n_native == n_np
    # same partition (labels may differ): check pairwise co-membership
    for t in (t_native, t_np):
        assert (t >= 0).sum() == len(np.unique(np.concatenate([kp1, kp2])))
    # co-membership via canonical relabeling by first occurrence
    def canon(t):
        seen = {}
        out = np.full(len(t), -1)
        for i, v in enumerate(t):
            if v < 0:
                continue
            out[i] = seen.setdefault(v, len(seen))
        return out
    np.testing.assert_array_equal(canon(t_native), canon(t_np))


def test_tracks_match_ground_truth():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=120, seed=9))
    tracks = establish_full_tracks(scene, vg)
    # every established track must correspond to exactly one GT point
    kp_point = gt["kp_point"]
    obs_kp = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
    obs_point = kp_point[obs_kp]
    for t in range(tracks.num_tracks):
        if not tracks.valid[t]:
            continue
        pts = obs_point[tracks.obs_track == t]
        assert len(np.unique(pts)) == 1, f"track {t} mixes GT points"


def test_tracks_with_outlier_matches_after_inlier_scoring():
    """Pipeline semantics: outlier matches are masked by the Sampson
    inlier classification (stage 2) before track establishment, exactly as
    in the reference where EstablishFullTracks consumes image_pair.inliers."""
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.processors.pair_inliers import image_pairs_inlier_count

    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=120, seed=10,
                         inlier_match_ratio=0.9))
    undistort_images(scene)
    image_pairs_inlier_count(scene, vg)
    # the outlier matches (rewired f2) must be flagged as non-inliers
    kp_point = gt["kp_point"]
    p1 = kp_point[scene.kp_offset[vg.pair_i[vg.match_pair]] + vg.match_f1]
    p2 = kp_point[scene.kp_offset[vg.pair_j[vg.match_pair]] + vg.match_f2]
    truly_inlier = p1 == p2
    # (an outlier can accidentally be epipolar-consistent, so allow slack)
    assert (vg.match_inlier & ~truly_inlier).mean() < 0.02
    assert (vg.match_inlier | ~truly_inlier).mean() > 0.97

    tracks = establish_full_tracks(scene, vg)
    assert tracks.valid.sum() > 60
    # surviving tracks must be pure
    obs_kp = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
    obs_point = kp_point[obs_kp]
    import numpy as _np
    mixed = 0
    for t in range(tracks.num_tracks):
        pts = obs_point[tracks.obs_track == t]
        if len(_np.unique(pts)) != 1:
            mixed += 1
    # epipolar-consistent outliers occasionally chain two tracks — the
    # same residue the reference leaves for downstream track filters
    assert mixed <= tracks.num_tracks * 0.05


def test_selection_caps_and_coverage():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=12, num_points3D=200, seed=11))
    tracks_full = establish_full_tracks(scene, vg)
    opts = TrackEstablishmentOptions(min_num_tracks_per_view=20)
    sel = find_tracks_for_problem(scene, tracks_full, opts)
    assert sel.num_tracks <= tracks_full.num_tracks
    # every image should be covered by >= min tracks (or as many as exist)
    counts = np.zeros(scene.num_images, dtype=int)
    seen = set()
    for t, i in zip(sel.obs_track, sel.obs_image):
        if (t, i) not in seen:
            seen.add((t, i))
            counts[i] += 1
    assert counts.min() >= 20

    # default options (min_num_tracks_per_view = -1): select all eligible
    sel_all = find_tracks_for_problem(scene, tracks_full)
    lengths = np.bincount(tracks_full.obs_track,
                          minlength=tracks_full.num_tracks)
    eligible = tracks_full.valid & (lengths >= 3) & (lengths <= 100)
    assert sel_all.num_tracks == int(eligible.sum())


def test_selection_python_fallback_agrees():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=100, seed=12))
    tracks_full = establish_full_tracks(scene, vg)
    opts = TrackEstablishmentOptions(min_num_tracks_per_view=15)

    sel_native = find_tracks_for_problem(scene, tracks_full, opts)

    lib = native._lib
    native._lib = False
    try:
        sel_py = find_tracks_for_problem(scene, tracks_full, opts)
    finally:
        native._lib = lib
    assert sel_native.num_tracks == sel_py.num_tracks
    np.testing.assert_array_equal(sel_native.obs_track, sel_py.obs_track)
