"""Unit tests for the retriangulation helpers, in particular track
MERGING — the merge half of colmap's CompleteAndMergeTracks
(glomap/controllers/track_retriangulation.cc:80; consumed threshold
`tri_merge_max_reproj_error`, TriangulatorOptions :34-36).
"""

import numpy as np

from glomap_tpu.config import TrackEstablishmentOptions
from glomap_tpu.controllers.retriangulation import merge_tracks
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, find_tracks_for_problem)
from glomap_tpu.ops.triangulation import triangulate_tracks
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _scene_with_tracks(seed=5):
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=12, num_points3D=150, seed=seed))
    undistort_images(scene)
    tracks = find_tracks_for_problem(
        scene, establish_full_tracks(scene, vg),
        TrackEstablishmentOptions(min_num_tracks_per_view=1000))
    triangulate_tracks(scene, tracks)
    tracks = tracks.compact()
    return scene, vg, tracks


def _split_long_tracks(tracks, min_len=6, jitter=1e-3, seed=0):
    """Deliberately split every track with >= min_len observations: the
    second half of its observations moves to a fresh track whose point is
    a slightly perturbed copy. Returns the number of splits."""
    rng = np.random.default_rng(seed)
    n0 = tracks.num_tracks
    lens = np.bincount(tracks.obs_track, minlength=n0)
    split_ids = np.nonzero(lens >= min_len)[0]
    starts = np.searchsorted(tracks.obs_track, np.arange(n0))
    rank = np.arange(tracks.num_obs) - starts[tracks.obs_track]
    new_of_split = {s: n0 + k for k, s in enumerate(split_ids)}
    sel = np.isin(tracks.obs_track, split_ids) & \
        (rank >= lens[tracks.obs_track] // 2)
    tracks.obs_track = tracks.obs_track.copy()
    tracks.obs_track[sel] = np.vectorize(new_of_split.get)(
        tracks.obs_track[sel])
    new_xyz = tracks.xyz[split_ids] + jitter * rng.standard_normal(
        (len(split_ids), 3))
    tracks.xyz = np.concatenate([tracks.xyz, new_xyz])
    tracks.valid = np.concatenate(
        [tracks.valid, np.ones(len(split_ids), dtype=bool)])
    if len(tracks.color):
        tracks.color = np.concatenate(
            [tracks.color, tracks.color[split_ids]])
    order = np.lexsort((tracks.obs_image, tracks.obs_track))
    tracks.obs_track = tracks.obs_track[order].astype(np.int32)
    tracks.obs_image = tracks.obs_image[order]
    tracks.obs_feature = tracks.obs_feature[order]
    tracks.obs_valid = tracks.obs_valid[order]
    return len(split_ids)


def test_merge_tracks_fuses_split_tracks():
    scene, vg, tracks = _scene_with_tracks()
    n0 = tracks.num_tracks
    n_split = _split_long_tracks(tracks)
    assert n_split > 20
    assert tracks.num_tracks == n0 + n_split

    moved = merge_tracks(scene, vg, tracks, max_reproj_px=15.0)
    assert moved > 0
    out = tracks.compact()
    # every deliberately split pair is fused back into a single point
    assert out.num_tracks == n0
    # no observations were lost in the process
    assert out.obs_valid.sum() >= tracks.num_obs - 1


def test_merge_tracks_keeps_distinct_points_apart():
    scene, vg, tracks = _scene_with_tracks()
    n0 = tracks.num_tracks
    moved = merge_tracks(scene, vg, tracks, max_reproj_px=15.0)
    # tracks from establish_full_tracks are transitive closures over the
    # match graph already — nothing should merge on clean data
    assert moved == 0
    assert tracks.compact().num_tracks == n0


def test_merge_rejects_pairs_beyond_threshold():
    scene, vg, tracks = _scene_with_tracks()
    n0 = tracks.num_tracks
    # split with a LARGE perturbation: the weighted-average merged point
    # must fail the every-observation reprojection validation
    n_split = _split_long_tracks(tracks, jitter=2.0)
    moved = merge_tracks(scene, vg, tracks, max_reproj_px=0.5)
    out = tracks.compact()
    assert out.num_tracks > n0  # the distant copies must stay separate
    assert moved == 0
