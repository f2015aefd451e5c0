"""Robustness: degenerate inputs must fail gracefully, not crash.

Counterpart of the reference's algorithmic degenerate-input handling
(SURVEY.md §5: bool returns + connected-component pruning)."""

import numpy as np

from glomap_tpu.config import GlobalMapperOptions
from glomap_tpu.controllers.global_mapper import GlobalMapper
from glomap_tpu.controllers.track_establishment import establish_full_tracks
from glomap_tpu.estimators.rotation_averaging import estimate_rotations
from glomap_tpu.estimators.global_positioning import solve_global_positioning
from glomap_tpu.estimators.bundle_adjustment import solve_bundle_adjustment
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def test_empty_scene_and_graph():
    scene = Scene()
    vg = ViewGraph()
    assert not estimate_rotations(scene, vg)
    tracks = Tracks()
    assert not solve_global_positioning(scene, vg, tracks)
    assert not solve_bundle_adjustment(scene, tracks)
    assert establish_full_tracks(scene, vg).num_tracks == 0


def test_disconnected_view_graph_keeps_largest_component():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=120, seed=110))
    # cut the graph into two components: invalidate every pair that
    # crosses the first 6 / last 4 image split
    cross = (vg.pair_i < 6) != (vg.pair_j < 6)
    vg.pair_valid &= ~cross
    n = vg.keep_largest_connected_component(scene)
    assert n == 6
    assert scene.frame_registered.sum() == 6


def test_mapper_survives_all_invalid_pairs():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=6, num_points3D=80, seed=111))
    vg.pair_valid[:] = False
    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    out = GlobalMapper(opt).solve(scene, vg)
    assert out is None  # graceful failure, no exception


def test_single_pair_graph():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=5, num_points3D=100, seed=112))
    # keep only one pair valid
    keep = np.zeros(vg.num_pairs, dtype=bool)
    keep[0] = True
    vg.pair_valid &= keep
    assert estimate_rotations(scene, vg)  # 2-frame chain solves fine


def test_tracks_all_filtered():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=6, num_points3D=80, seed=113))
    from glomap_tpu.processors.undistortion import undistort_images
    undistort_images(scene)
    tracks = establish_full_tracks(scene, vg)
    tracks.obs_valid[:] = False
    assert not solve_bundle_adjustment(scene, tracks)


def test_bucket_padding_reuses_compilation():
    """Two BA calls with slightly different obs counts must map onto the
    same padded shapes (jit-cache friendliness)."""
    from glomap_tpu.utils.padding import bucket_size
    assert bucket_size(1000) == bucket_size(1100)
    assert bucket_size(256) == 256
    assert bucket_size(100000) >= 100000
    # growth bounded
    assert bucket_size(100000) < 125000
