"""Track establishment: union-find concatenation + greedy selection.

Counterpart of glomap/controllers/track_establishment.{h,cc} (TrackEngine):
  EstablishFullTracks — union-find over (image, feature) keys linked by
    inlier matches of valid pairs; tracks touching one image with two
    features further apart than thres_inconsistency are discarded
    (track_establishment.cc:107-146).
  FindTracksForProblem — longest-first greedy selection until every view
    has enough tracks; track views capped to [min, max]; total capped
    (track_establishment.cc:153-225). min_num_tracks_per_view < 0
    reproduces the reference default behavior of selecting every eligible
    track (unsigned-compare quirk in the reference).

The hot O(matches) passes run in native C++ (glomap_tpu/native) over dense
global keypoint indices; the consistency filter is vectorized NumPy.
"""

from __future__ import annotations

import numpy as np

from glomap_tpu import native
from glomap_tpu.config import TrackEstablishmentOptions
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph


def _kp_image_map(scene: Scene) -> np.ndarray:
    """Per-keypoint image index from kp_offset."""
    out = np.zeros(scene.num_keypoints, dtype=np.int64)
    counts = np.diff(scene.kp_offset)
    out = np.repeat(np.arange(scene.num_images, dtype=np.int64), counts)
    return out


def inlier_match_endpoints(scene: Scene, vg: ViewGraph):
    """Global keypoint indices (kp1, kp2) of every valid inlier match.

    The compress + gather preamble runs over ALL matches (8M+ on
    bench-scale scenes, ~0.5 s) and is needed by track establishment
    (3x per retriangulation), completion AND merging in every refinement
    round — cached on the view graph, invalidated when the masks change.
    The key hashes the mask CONTENTS (masks are mutated in place with
    &=, so object identity can't detect changes, and the old
    count-checksum served stale endpoints if a recompute coincidentally
    preserved the totals): ~3 ms on the 8M-match bench scene vs ~0.5 s
    for the rebuild."""
    key = (vg.num_matches, hash(vg.pair_valid.tobytes()),
           hash(vg.match_inlier.tobytes()))
    cache = getattr(vg, "_match_kp_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1], cache[2]
    use = vg.pair_valid[vg.match_pair] & vg.match_inlier
    mp = vg.match_pair[use]
    # int32 endpoints: halves the memory traffic of every downstream
    # 8M-row sweep (completion/merge gathers)
    kp1 = (scene.kp_offset[vg.pair_i[mp]] +
           vg.match_f1[use]).astype(np.int32)
    kp2 = (scene.kp_offset[vg.pair_j[mp]] +
           vg.match_f2[use]).astype(np.int32)
    vg._match_kp_cache = (key, kp1, kp2)
    return kp1, kp2


def establish_full_tracks(scene: Scene, vg: ViewGraph,
                          opts: TrackEstablishmentOptions | None = None,
                          kp_mask: np.ndarray | None = None) -> Tracks:
    """kp_mask (num_keypoints,) bool: restrict the union-find to matches
    whose BOTH endpoints are unmasked — used by the retriangulation
    generations to re-track only the keypoints not yet explained by an
    accepted point (the flat-design counterpart of colmap's per-image
    triangulation seeding new points from leftover features)."""
    opts = opts or TrackEstablishmentOptions()
    kp1, kp2 = inlier_match_endpoints(scene, vg)
    # Full (unmasked) closures repeat identically between stage-4 track
    # establishment and retriangulation generation 0 — the view-graph
    # masks don't change in between (stages 5-6 filter TRACK obs, not
    # matches). Cache on the same mask-content key as the endpoint
    # cache; a COPY is returned because callers mutate the result.
    cache_key = None
    if kp_mask is None:
        cache_key = (vg.num_matches, hash(vg.pair_valid.tobytes()),
                     hash(vg.match_inlier.tobytes()),
                     float(opts.thres_inconsistency))
        cached = getattr(vg, "_full_tracks_cache", None)
        if cached is not None and cached[0] == cache_key:
            return cached[1].copy()
    if kp_mask is not None:
        keep = kp_mask[kp1] & kp_mask[kp2]
        kp1 = kp1[keep]
        kp2 = kp2[keep]

    # Consistency-AWARE union (round-3): a union that would put two
    # features of one image further apart than thres_inconsistency in
    # the same track is refused — the joining match is a bridge between
    # different physical points. The reference unions everything and
    # discards inconsistent tracks wholesale
    # (track_establishment.cc:107-146), which collapses on dense scenes:
    # a few thousand epipolar-consistent wrong matches fuse >90% of
    # keypoints into one giant discarded component (measured on the
    # 100-frame/8M-match bench scene). Preventive rejection keeps every
    # true track. Non-finite thresholds fall back to plain union-find
    # (used by callers that WANT the raw transitive closure).
    if np.isfinite(opts.thres_inconsistency) and \
            opts.thres_inconsistency < 1e9:
        track_of_kp, num_tracks = native.establish_tracks_consistent(
            scene.num_keypoints, kp1, kp2, _kp_image_map(scene),
            scene.kp_xy, opts.thres_inconsistency)
    else:
        track_of_kp, num_tracks = native.establish_tracks(
            scene.num_keypoints, kp1, kp2)

    obs_kp = np.nonzero(track_of_kp >= 0)[0]
    obs_track = track_of_kp[obs_kp]
    kp_image = _kp_image_map(scene)
    obs_image = kp_image[obs_kp]
    obs_feature = obs_kp - scene.kp_offset[obs_image]

    # emit observations sorted by (track, image): downstream solvers rely
    # on the track axis being sorted (Pallas sorted-segment reductions in
    # BA; masks and compaction preserve the order)
    order = np.lexsort((obs_image, obs_track))
    obs_track = obs_track[order]
    obs_image = obs_image[order]
    obs_feature = obs_feature[order]
    obs_kp = obs_kp[order]

    # consistency filter: per (track, image) group, bbox-diagonal distance
    # between features must stay within thres_inconsistency (exact for
    # 2-feature groups; a tight upper bound of the diameter for larger)
    t_s = obs_track
    i_s = obs_image
    xy_s = scene.kp_xy[obs_kp]
    new_group = np.ones(len(t_s), dtype=bool)
    new_group[1:] = (t_s[1:] != t_s[:-1]) | (i_s[1:] != i_s[:-1])
    starts = np.nonzero(new_group)[0]
    if len(starts):
        x_min = np.minimum.reduceat(xy_s[:, 0], starts)
        x_max = np.maximum.reduceat(xy_s[:, 0], starts)
        y_min = np.minimum.reduceat(xy_s[:, 1], starts)
        y_max = np.maximum.reduceat(xy_s[:, 1], starts)
        diag = np.hypot(x_max - x_min, y_max - y_min)
        bad_group = diag > opts.thres_inconsistency
        bad_track_ids = np.unique(t_s[starts[bad_group]])
    else:
        bad_track_ids = np.zeros(0, dtype=np.int64)

    track_valid = np.ones(num_tracks, dtype=bool)
    track_valid[bad_track_ids] = False
    keep_obs = track_valid[obs_track]

    tracks = Tracks(
        xyz=np.zeros((num_tracks, 3)),
        valid=track_valid,
        color=np.zeros((num_tracks, 3), dtype=np.uint8),
        obs_track=obs_track[keep_obs].astype(np.int32),
        obs_image=obs_image[keep_obs].astype(np.int32),
        obs_feature=obs_feature[keep_obs].astype(np.int32),
        obs_valid=np.ones(int(keep_obs.sum()), dtype=bool),
    )
    if cache_key is not None:
        vg._full_tracks_cache = (cache_key, tracks.copy())
    return tracks


def find_tracks_for_problem(scene: Scene, tracks_full: Tracks,
                            opts: TrackEstablishmentOptions | None = None
                            ) -> Tracks:
    """Greedy coverage selection; returns a compacted selected-track set."""
    opts = opts or TrackEstablishmentOptions()
    n = tracks_full.num_tracks
    if n == 0:
        return tracks_full.copy()

    registered = scene.frame_registered[scene.image_frame]
    obs_ok = tracks_full.obs_valid & registered[tracks_full.obs_image] & \
        tracks_full.valid[tracks_full.obs_track]
    obs_track = tracks_full.obs_track[obs_ok].astype(np.int64)
    obs_image = tracks_full.obs_image[obs_ok].astype(np.int64)

    # eligibility: total obs count within [min, max] (reference filters on
    # observations.size()), then distinct-image count >= min
    total_obs = np.bincount(obs_track, minlength=n)
    pair_keys = obs_track * np.int64(scene.num_images) + obs_image
    uniq_pairs = np.unique(pair_keys)
    num_images_per_track = np.bincount(uniq_pairs // scene.num_images,
                                       minlength=n)
    eligible = (tracks_full.valid &
                (total_obs >= opts.min_num_view_per_track) &
                (total_obs <= opts.max_num_view_per_track) &
                (num_images_per_track >= opts.min_num_view_per_track))

    selected = native.select_tracks(
        n, obs_track, obs_image, eligible.astype(np.uint8),
        num_images_per_track, scene.num_images,
        opts.min_num_tracks_per_view, opts.max_num_tracks)

    out = tracks_full.copy()
    out.valid = out.valid & selected
    out.obs_valid = obs_ok & selected[tracks_full.obs_track]
    return out.compact()
