"""Retriangulation: rebuild the full track set from all inlier matches and
triangulate against the current (post-BA) geometry.

Counterpart of glomap/controllers/track_retriangulation.{h,cc}
(RetriangulateTracks): the reference converts to colmap, wipes points,
runs IncrementalMapper::TriangulateImage per image + CompleteAndMergeTracks
and colmap BA refinement rounds. In the flat-array design the transitive
match closure (union-find over ALL inlier matches) already performs
complete+merge, so retriangulation becomes: re-establish full tracks ->
batched per-track two-view RANSAC triangulation (colmap
EstimateTriangulation counterpart) -> reprojection / min-angle acceptance
(tri_complete_max_reproj_error = 15 px, tri_min_angle = 1 deg) -> one
clean re-triangulation round. BA refinement runs in the caller
(controllers/global_mapper.py stage 7), mirroring the reference.
"""

from __future__ import annotations

import logging

import numpy as np

from glomap_tpu.config import TriangulatorOptions
from glomap_tpu.controllers.track_establishment import establish_full_tracks
from glomap_tpu.ops.triangulation import (ransac_triangulate_tracks,
                                          triangulate_tracks)
from glomap_tpu.processors import track_filter as tf
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


def retriangulate_tracks(scene: Scene, vg: ViewGraph, tracks: Tracks,
                         opts: TriangulatorOptions | None = None) -> Tracks:
    opts = opts or TriangulatorOptions()
    if not scene.kp_ray.any():
        undistort_images(scene)

    new_tracks = establish_full_tracks(scene, vg)
    # only observations of registered frames participate
    reg = scene.frame_registered[scene.image_frame]
    new_tracks.obs_valid &= reg[new_tracks.obs_image]

    # robust creation: per-track two-view RANSAC with angular support
    # (counterpart of colmap EstimateTriangulation inside TriangulateImage;
    # outlier observations in the transitive match closure are masked)
    ok = ransac_triangulate_tracks(
        scene, new_tracks,
        max_angle_error_deg=opts.tri_create_max_angle_error,
        min_tri_angle_deg=opts.tri_min_angle,
        num_hyps=opts.tri_ransac_hypotheses)
    new_tracks.valid &= ok

    # acceptance: pixel-space reprojection below the (loose) completion
    # threshold, then min triangulation angle
    tf.filter_tracks_by_reprojection(
        scene, new_tracks, opts.tri_complete_max_reproj_error,
        in_normalized_image=False)
    tf.filter_tracks_by_triangulation_angle(scene, new_tracks,
                                            opts.tri_min_angle)
    # drop tracks that fell under 2 observations, re-triangulate cleanly
    counts = np.bincount(new_tracks.obs_track[new_tracks.obs_valid],
                         minlength=new_tracks.num_tracks)
    new_tracks.valid &= counts >= 2
    ok = triangulate_tracks(scene, new_tracks)
    new_tracks.valid &= ok

    # completion: re-attach masked observations that the freshly
    # triangulated geometry explains within the loose threshold
    # (colmap CompleteAndMergeTracks, track_retriangulation.cc:80)
    tf.complete_tracks(scene, new_tracks,
                       opts.tri_complete_max_reproj_error)

    out = new_tracks.compact()
    logger.info("Retriangulation: %d tracks (%d observations)",
                out.num_tracks, out.num_obs)
    return out
