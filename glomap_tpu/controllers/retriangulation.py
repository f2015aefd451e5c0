"""Retriangulation: rebuild the full track set from all inlier matches and
triangulate against the current (post-BA) geometry.

Counterpart of glomap/controllers/track_retriangulation.{h,cc}
(RetriangulateTracks): the reference converts to colmap, wipes points,
runs IncrementalMapper::TriangulateImage per image + CompleteAndMergeTracks
and colmap BA refinement rounds. The flat-array design achieves the same
coverage with:
  * GENERATIONAL track building — the union-find closure per generation
    is restricted to keypoints not yet explained by an accepted point,
    so components fused by outlier matches split (the bridge match drops
    out once one endpoint is explained) instead of dying wholesale;
  * per-track two-view RANSAC triangulation (colmap
    EstimateTriangulation counterpart) + reprojection / min-angle
    acceptance (tri_complete_max_reproj_error = 15 px, tri_min_angle);
  * two completion passes (colmap CompleteAndMergeTracks role):
    in-place re-validation of masked observations the refined geometry
    explains, and match-graph attachment of keypoints whose
    correspondences land in an accepted track.
BA refinement rounds run in the caller (controllers/global_mapper.py
stage 7) with the reference's <0.05%-change exit.
"""

from __future__ import annotations

import logging

import numpy as np

from glomap_tpu.config import TriangulatorOptions
from glomap_tpu.controllers.track_establishment import (
    establish_full_tracks, inlier_match_endpoints as
    _inlier_match_endpoints)
from glomap_tpu.math import rotation as rotm
from glomap_tpu.ops.triangulation import (ransac_triangulate_tracks,
                                          triangulate_tracks)
from glomap_tpu.processors import track_filter as tf
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


def _triangulate_track_set(scene: Scene, t: Tracks,
                           opts: TriangulatorOptions) -> Tracks:
    """RANSAC-create + filter + clean re-triangulation of one track set."""
    ok = ransac_triangulate_tracks(
        scene, t,
        max_angle_error_deg=opts.tri_create_max_angle_error,
        min_tri_angle_deg=opts.tri_min_angle,
        num_hyps=opts.tri_ransac_hypotheses)
    t.valid &= ok

    # acceptance: pixel-space reprojection below the (loose) completion
    # threshold, then min triangulation angle
    tf.filter_tracks_by_reprojection(
        scene, t, opts.tri_complete_max_reproj_error,
        in_normalized_image=False)
    tf.filter_tracks_by_triangulation_angle(scene, t, opts.tri_min_angle)
    # drop tracks that fell under 2 observations, re-triangulate cleanly
    counts = np.bincount(t.obs_track[t.obs_valid], minlength=t.num_tracks)
    t.valid &= counts >= 2
    ok = triangulate_tracks(scene, t)
    t.valid &= ok
    return t.compact()


def _concat_tracks(a: Tracks, b: Tracks) -> Tracks:
    """Append track set b after a (ids offset; obs stay track-sorted)."""
    off = a.num_tracks
    return Tracks(
        xyz=np.concatenate([a.xyz, b.xyz]),
        valid=np.concatenate([a.valid, b.valid]),
        color=np.concatenate([a.color, b.color]) if len(a.color) or
        len(b.color) else a.color,
        obs_track=np.concatenate([a.obs_track,
                                  b.obs_track + np.int32(off)]),
        obs_image=np.concatenate([a.obs_image, b.obs_image]),
        obs_feature=np.concatenate([a.obs_feature, b.obs_feature]),
        obs_valid=np.concatenate([a.obs_valid, b.obs_valid]),
    )


def complete_tracks_from_matches(scene: Scene, vg: ViewGraph,
                                 tracks: Tracks, max_reproj_px: float,
                                 rounds: int = 3) -> int:
    """Attach UNEXPLAINED keypoints to existing tracks through the match
    graph: a keypoint with an inlier match to a keypoint explained by
    track T becomes a candidate (kp, T) and is accepted when T's point
    reprojects within the loose completion threshold.

    This is the part of colmap CompleteTracks
    (track_retriangulation.cc:80) that the in-place re-validation
    (processors/track_filter.complete_tracks) cannot do: a keypoint that
    an outlier match fused into the WRONG union-find component has no
    observation row in its true track, so it must be re-attached via its
    own 2-view correspondences. Transitive (multi-round). Appends obs
    rows and re-sorts the obs arrays by (track, image). Returns
    #observations added."""
    import jax
    from glomap_tpu.processors.track_filter import _img_from_cam_jit

    import time as _time
    _tpre = _time.monotonic()
    kp1, kp2 = _inlier_match_endpoints(scene, vg)
    _tep = _time.monotonic()
    kp_image = np.repeat(np.arange(scene.num_images, dtype=np.int32),
                         np.diff(scene.kp_offset))
    q_img, t_img = scene.image_cam_from_world()
    reg_img = scene.frame_registered[scene.image_frame]
    cpu = jax.local_devices(backend="cpu")[0]
    # per-keypoint registered flag once (2M rows), then one 8M bool
    # gather per endpoint — the old concatenated a/b direction arrays
    # were 2x16M int32 allocations + 2x16M gathers (~0.7 s of the pass)
    reg_kp = reg_img[kp_image]
    reg1 = reg_kp[kp1]
    reg2 = reg_kp[kp2]
    logger.debug("match-complete pre: endpoints %.2fs, reg %.2fs",
                 _tep - _tpre, _time.monotonic() - _tep)
    total_added = 0
    newly = None  # None = first round (every explained endpoint is new)
    for _round in range(max(rounds, 1)):
        _t0 = _time.monotonic()
        kp_track = np.full(scene.num_keypoints, -1, dtype=np.int64)
        ok_obs = tracks.obs_valid & tracks.valid[tracks.obs_track]
        kp_idx = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
        kp_track[kp_idx[ok_obs]] = tracks.obs_track[ok_obs]

        # candidates: one endpoint explained, the other not. Rounds 2+
        # are INCREMENTAL: the track geometry is fixed inside this loop,
        # so a (kp, track) candidate rejected on reprojection stays
        # rejected forever — fresh candidates can only enter through an
        # endpoint explained in the PREVIOUS round. Restricting the scan
        # to those rows makes the later rounds (which mostly re-rejected
        # the same ~100k candidates) near-free.
        # The scan gathers BOOL flags per match endpoint (1 byte/row),
        # both directions without materializing concatenated 16M-row
        # arrays: the direct kp_track[a]/kp_track[b] int64 gathers over
        # 2x16M rows were ~0.7-1.0 s of host time; the per-track ids are
        # looked up only for the surviving rows.
        if newly is None:
            expl = kp_track >= 0
            e1 = expl[kp1]
            e2 = expl[kp2]
            cand_f = e1 & ~e2 & reg2  # kp1 explains kp2
            cand_b = e2 & ~e1 & reg1  # kp2 explains kp1
        else:
            nw1 = newly[kp1]
            nw2 = newly[kp2]
            unex = kp_track < 0
            cand_f = nw1 & unex[kp2] & reg2
            cand_b = nw2 & unex[kp1] & reg1
        _t1 = _time.monotonic()
        ckp = np.concatenate([kp2[cand_f], kp1[cand_b]])
        ctr = np.concatenate([kp_track[kp1[cand_f]],
                              kp_track[kp2[cand_b]]])
        if len(ckp) == 0:
            break
        # dedupe (kp, track)
        key = ckp * np.int64(tracks.num_tracks) + ctr
        uniq = np.unique(key)
        ckp = uniq // tracks.num_tracks
        ctr = uniq % tracks.num_tracks
        _t2 = _time.monotonic()
        logger.debug("match-complete round %d: scan %.2fs, dedupe %.2fs, "
                     "%d cand", _round, _t1 - _t0, _t2 - _t1, len(ckp))

        img = kp_image[ckp]
        cam = scene.image_camera[img]
        X = tracks.xyz[ctr]
        pt_cam = np.asarray(rotm.quat_rotate(q_img[img], X)) + t_img[img]
        px = np.asarray(_img_from_cam_jit(
            jax.device_put(scene.cam_params[cam], cpu),
            jax.device_put(scene.cam_kind[cam], cpu),
            jax.device_put(pt_cam, cpu)))
        err = np.linalg.norm(px - scene.kp_xy[ckp], axis=-1)
        logger.debug("match-complete round %d: project %.2fs", _round,
                     _time.monotonic() - _t2)
        good = (err < max_reproj_px) & (pt_cam[:, 2] > 1e-12)
        if not good.any():
            break
        # one track per keypoint: keep the smallest error
        order = np.lexsort((err[good], ckp[good]))
        gkp = ckp[good][order]
        gtr = ctr[good][order]
        first = np.ones(len(gkp), dtype=bool)
        first[1:] = gkp[1:] != gkp[:-1]
        gkp = gkp[first]
        gtr = gtr[first]
        newly = np.zeros(scene.num_keypoints, dtype=bool)
        newly[gkp] = True

        tracks.obs_track = np.concatenate(
            [tracks.obs_track, gtr.astype(np.int32)])
        tracks.obs_image = np.concatenate(
            [tracks.obs_image, kp_image[gkp].astype(np.int32)])
        tracks.obs_feature = np.concatenate(
            [tracks.obs_feature,
             (gkp - scene.kp_offset[kp_image[gkp]]).astype(np.int32)])
        tracks.obs_valid = np.concatenate(
            [tracks.obs_valid, np.ones(len(gkp), dtype=bool)])
        total_added += len(gkp)

    if total_added:
        # restore the (track, image)-sorted invariant the solvers expect
        order = np.lexsort((tracks.obs_image, tracks.obs_track))
        tracks.obs_track = tracks.obs_track[order]
        tracks.obs_image = tracks.obs_image[order]
        tracks.obs_feature = tracks.obs_feature[order]
        tracks.obs_valid = tracks.obs_valid[order]
        logger.info("Completed %d observations through the match graph",
                    total_added)
    return total_added


def merge_tracks(scene: Scene, vg: ViewGraph, tracks: Tracks,
                 max_reproj_px: float, rounds: int = 3) -> int:
    """Fuse track pairs that describe the same physical 3D point — the
    MERGE half of colmap's CompleteAndMergeTracks
    (track_retriangulation.cc:80; colmap IncrementalTriangulator::Merge):

      * candidates: two DIFFERENT tracks joined by >=1 inlier two-view
        correspondence (one endpoint keypoint explained by each);
      * proposed merged point: track-length-weighted average of the two
        XYZ (colmap's merged_xyz recipe);
      * acceptance: EVERY valid observation of both tracks reprojects the
        merged point within `max_reproj_px` (tri_merge_max_reproj_error)
        at positive depth;
      * accepted pairs merge greedily (a track participates in at most
        one merge per round; colmap's recursive re-merge becomes the
        outer rounds), observations retarget to the longer track, exact
        duplicate (track, image, feature) rows dedupe, and the flat obs
        arrays re-sort to the (track, image) invariant the sorted-window
        solvers rely on.

    Returns the number of observations moved by merging. Host-side
    numpy + one jitted camera-projection call on the local CPU backend
    (this runs between device solves; see CLAUDE.md eager-op tax)."""
    import jax
    from glomap_tpu.processors.track_filter import _img_from_cam_jit

    if tracks.num_obs == 0 or vg.num_pairs == 0:
        return 0
    import time as _time
    mkp1, mkp2 = _inlier_match_endpoints(scene, vg)
    q_img, t_img = scene.image_cam_from_world()
    cpu = jax.local_devices(backend="cpu")[0]

    total_moved = 0
    for _round in range(max(rounds, 1)):
        _tr = _time.monotonic()
        n_tr = tracks.num_tracks
        ok_obs = tracks.obs_valid & tracks.valid[tracks.obs_track]
        kp_track = np.full(scene.num_keypoints, -1, dtype=np.int64)
        kp_idx_all = scene.kp_offset[tracks.obs_image] + tracks.obs_feature
        kp_track[kp_idx_all[ok_obs]] = tracks.obs_track[ok_obs]

        ta = kp_track[mkp1]
        tb = kp_track[mkp2]
        cand = (ta >= 0) & (tb >= 0) & (ta != tb)
        logger.debug("merge round %d: scan %.2fs, %d cand matches",
                     _round, _time.monotonic() - _tr, int(cand.sum()))
        if not cand.any():
            break
        t1m = np.minimum(ta[cand], tb[cand])
        t2m = np.maximum(ta[cand], tb[cand])
        pair_key, inv = np.unique(t1m * np.int64(n_tr) + t2m,
                                  return_inverse=True)
        t1 = pair_key // n_tr
        t2 = pair_key % n_tr
        n_cand = len(t1)

        # CSR over the valid obs rows (already track-sorted)
        vrows = np.nonzero(ok_obs)[0]
        o_tr = tracks.obs_track[vrows]
        starts = np.searchsorted(o_tr, np.arange(n_tr))
        ends = np.searchsorted(o_tr, np.arange(n_tr) + 1)
        n1 = (ends - starts)[t1]
        n2 = (ends - starts)[t2]

        # colmap merged_xyz: track-length-weighted average
        w1 = n1.astype(np.float64)[:, None]
        w2 = n2.astype(np.float64)[:, None]
        merged_xyz = (w1 * tracks.xyz[t1] + w2 * tracks.xyz[t2]) / \
            np.maximum(w1 + w2, 1)

        # EXACT endpoint prefilter: each matched endpoint keypoint IS a
        # valid observation row of its track (that's how kp_track mapped
        # it), so the all-obs acceptance below already requires the
        # merged point to reproject within threshold at both endpoints.
        # Checking the 2 endpoints per candidate match first (a few k
        # rows) prunes the expensive per-obs validation (~100 rows per
        # candidate) to the survivors — in the post-BA refinement rounds
        # nearly every candidate was already rejected here.
        ekp = np.concatenate([mkp1[cand], mkp2[cand]])
        epair = np.concatenate([inv, inv])
        eimg = np.searchsorted(scene.kp_offset, ekp, side="right") - 1
        ecam = scene.image_camera[eimg]
        pt_cam_e = np.asarray(rotm.quat_rotate(
            q_img[eimg], merged_xyz[epair])) + t_img[eimg]
        px_e = np.asarray(_img_from_cam_jit(
            jax.device_put(scene.cam_params[ecam], cpu),
            jax.device_put(scene.cam_kind[ecam], cpu),
            jax.device_put(pt_cam_e, cpu)))
        err_e = np.linalg.norm(px_e - scene.kp_xy[ekp], axis=-1)
        bad_e = (err_e >= max_reproj_px) | (pt_cam_e[:, 2] <= 1e-12)
        # bincount, not logical_or.at (interpreted per-element loop)
        survive = np.bincount(epair, weights=bad_e,
                              minlength=n_cand) == 0
        logger.debug("merge round %d: %d/%d pairs past endpoint "
                     "prefilter", _round, int(survive.sum()), n_cand)
        if not survive.any():
            break
        t1 = t1[survive]
        t2 = t2[survive]
        n1 = n1[survive]
        n2 = n2[survive]
        merged_xyz = merged_xyz[survive]
        n_cand = len(t1)

        # flatten (candidate, observation-of-either-track) rows
        cnt = n1 + n2
        cum = np.concatenate([[0], np.cumsum(cnt)])
        cand_of_row = np.repeat(np.arange(n_cand), cnt)
        pos = np.arange(cum[-1]) - cum[cand_of_row]
        in_first = pos < n1[cand_of_row]
        src = np.where(in_first, starts[t1[cand_of_row]] + pos,
                       starts[t2[cand_of_row]] + pos - n1[cand_of_row])
        rows = vrows[src]

        img = tracks.obs_image[rows]
        cam = scene.image_camera[img]
        X = merged_xyz[cand_of_row]
        pt_cam = np.asarray(rotm.quat_rotate(q_img[img], X)) + t_img[img]
        px = np.asarray(_img_from_cam_jit(
            jax.device_put(scene.cam_params[cam], cpu),
            jax.device_put(scene.cam_kind[cam], cpu),
            jax.device_put(pt_cam, cpu)))
        kp = scene.kp_offset[img] + tracks.obs_feature[rows]
        err = np.linalg.norm(px - scene.kp_xy[kp], axis=-1)
        row_ok = (err < max_reproj_px) & (pt_cam[:, 2] > 1e-12)
        bad = np.bincount(cand_of_row, weights=~row_ok,
                          minlength=n_cand) > 0
        acc = ~bad & (n1 > 0) & (n2 > 0)
        if not acc.any():
            break

        # greedy: one merge per track per round (colmap's recursion ->
        # next round re-candidates the merged tracks)
        taken = np.zeros(n_tr, dtype=bool)
        moved = 0
        new_track_of = np.arange(n_tr, dtype=np.int64)
        for a, b, X_m in zip(t1[acc], t2[acc], merged_xyz[acc]):
            if taken[a] or taken[b]:
                continue
            taken[a] = taken[b] = True
            # keep the longer track's id
            tgt, src_t = (a, b) if ends[a] - starts[a] >= \
                ends[b] - starts[b] else (b, a)
            new_track_of[src_t] = tgt
            tracks.xyz[tgt] = X_m
            tracks.valid[src_t] = False
            moved += int(ends[src_t] - starts[src_t])
        if moved == 0:
            break
        remap = new_track_of != np.arange(n_tr)
        sel = remap[tracks.obs_track]
        tracks.obs_track[sel] = new_track_of[
            tracks.obs_track[sel]].astype(np.int32)
        total_moved += moved

        # dedupe exact (track, image, feature) duplicates (both tracks
        # may already explain the same keypoint via completion)
        key = (tracks.obs_track.astype(np.int64) * scene.num_keypoints +
               (scene.kp_offset[tracks.obs_image] + tracks.obs_feature))
        # prefer keeping valid rows: sort by (key, ~valid)
        order = np.lexsort((~tracks.obs_valid, key))
        dup = np.zeros(tracks.num_obs, dtype=bool)
        dup[order[1:]] = key[order[1:]] == key[order[:-1]]
        tracks.obs_valid &= ~dup

        # restore the (track, image)-sorted invariant BEFORE the next
        # round (the CSR searchsorted above requires it; the solvers'
        # sorted-window kernels rely on it too)
        order = np.lexsort((tracks.obs_image, tracks.obs_track))
        tracks.obs_track = tracks.obs_track[order]
        tracks.obs_image = tracks.obs_image[order]
        tracks.obs_feature = tracks.obs_feature[order]
        tracks.obs_valid = tracks.obs_valid[order]
        logger.debug("merge round %d: total %.2fs, %d moved", _round,
                     _time.monotonic() - _tr, moved)

    if total_moved:
        logger.info("Merged tracks: %d observations moved", total_moved)
    return total_moved


def retriangulate_tracks(scene: Scene, vg: ViewGraph, tracks: Tracks,
                         opts: TriangulatorOptions | None = None) -> Tracks:
    opts = opts or TriangulatorOptions()
    if not scene.kp_ray.any():
        undistort_images(scene)
    reg = scene.frame_registered[scene.image_frame]

    # Generational track building: outlier matches fuse unrelated points
    # into one union-find component; RANSAC keeps only the majority
    # component, and the leftover observations would die with it. Each
    # generation re-runs the transitive closure restricted to the
    # keypoints not yet explained by an accepted point — splitting the
    # corrupted components exactly where colmap's per-image
    # TriangulateImage would seed fresh points from leftover features
    # (track_retriangulation.cc:59-122). This is what sustains the
    # reference's >=98%-observations oracle under outlier matches.
    # the consistency-aware union (track_establishment round-3) already
    # refuses bridge unions, so retriangulation re-tracks with the
    # standard inconsistency threshold; residual wrong-component
    # keypoints (bridges accepted before their components grew) are
    # handled by the RANSAC-majority + generational splitting below.
    from glomap_tpu.config import TrackEstablishmentOptions
    te_opts = TrackEstablishmentOptions()

    import time as _time
    merged: Tracks | None = None
    kp_mask = None
    for gen in range(max(int(opts.tri_num_generations), 1)):
        _tg = _time.monotonic()
        t = establish_full_tracks(scene, vg, te_opts, kp_mask=kp_mask)
        t.obs_valid &= reg[t.obs_image]
        if int(t.obs_valid.sum()) < 2:
            break
        _te = _time.monotonic()
        t = _triangulate_track_set(scene, t, opts)
        logger.info("retri gen %d: establish %.2fs, triangulate %.2fs "
                    "(%d tracks)", gen, _te - _tg,
                    _time.monotonic() - _te, t.num_tracks)
        if t.num_tracks == 0:
            break
        merged = t if merged is None else _concat_tracks(merged, t)
        explained = np.zeros(scene.num_keypoints, dtype=bool)
        kp_idx = scene.kp_offset[merged.obs_image] + merged.obs_feature
        explained[kp_idx[merged.obs_valid &
                         merged.valid[merged.obs_track]]] = True
        kp_mask = ~explained
        if int(kp_mask.sum()) == 0:
            break

    if merged is None:
        merged = Tracks()
    _tc = _time.monotonic()
    # completion: re-attach masked observations that the freshly
    # triangulated geometry explains within the loose threshold
    # (colmap CompleteAndMergeTracks, track_retriangulation.cc:80)
    tf.complete_tracks(scene, merged, opts.tri_complete_max_reproj_error)
    _t1 = _time.monotonic()
    # ...and attach still-unexplained keypoints to existing tracks
    # through their own inlier matches (wrong-component rescues)
    complete_tracks_from_matches(scene, vg, merged,
                                 opts.tri_complete_max_reproj_error)
    _t2 = _time.monotonic()
    # ...then fuse tracks that describe the same physical point (the
    # MERGE half of colmap CompleteAndMergeTracks)
    merge_tracks(scene, vg, merged, opts.tri_merge_max_reproj_error)
    logger.info("retri post: complete %.2fs, match-complete %.2fs, "
                "merge %.2fs", _t1 - _tc, _t2 - _t1,
                _time.monotonic() - _t2)

    out = merged.compact()
    logger.info("Retriangulation: %d tracks (%d observations)",
                out.num_tracks, out.num_obs)
    return out
