"""GlobalMapper: the 8-stage global SfM pipeline.

Counterpart of glomap/controllers/global_mapper.{h,cc} (GlobalMapper::
Solve, :19-361): preprocessing -> view-graph calibration -> relative pose
estimation -> rotation averaging (x2 with rotation filtering) -> track
establishment -> global positioning -> iterated staged bundle adjustment
with progressive track filtering and early exit -> retriangulation ->
optional pruning. Stage structure, filter thresholds, iteration budgets
and early-exit condition (<0.1% tracks filtered) mirror the reference.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from glomap_tpu.config import GlobalMapperOptions
from glomap_tpu.controllers import track_establishment as te
from glomap_tpu.controllers.rotation_averager import (
    RotationAveragerOptions, solve_rotation_averaging)
from glomap_tpu.estimators.bundle_adjustment import solve_bundle_adjustment
from glomap_tpu.estimators.global_positioning import solve_global_positioning
from glomap_tpu.processors import relpose_filter as rpf
from glomap_tpu.processors import track_filter as tf
from glomap_tpu.processors.normalization import normalize_reconstruction
from glomap_tpu.processors.pair_inliers import image_pairs_inlier_count
from glomap_tpu.processors.undistortion import undistort_images
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


class GlobalMapper:
    def __init__(self, options: GlobalMapperOptions | None = None):
        self.options = options or GlobalMapperOptions()

    def solve(self, scene: Scene, view_graph: ViewGraph,
              tracks: Tracks | None = None) -> Tracks | None:
        """Run the pipeline; mutates scene/view_graph, returns tracks
        (or None on failure)."""
        opt = self.options
        # optional device mesh: shards the observation/edge axes of every
        # solver across chips (SPMD collectives over ICI, SURVEY.md §2.3)
        mesh = None
        if opt.device_mesh_shape:
            import numpy as _np
            from glomap_tpu.parallel.mesh import make_mesh
            n_dev = int(_np.prod(opt.device_mesh_shape))
            mesh = make_mesh(n_dev)
            logger.info("solvers run on a %d-device mesh", n_dev)
        from glomap_tpu.utils.profiling import StageTimer
        timer = StageTimer()
        self.timer = timer
        _stack = []

        def stage(name):
            # close the previous stage context, open the next
            while _stack:
                _stack.pop().__exit__(None, None, None)
            cm = timer.stage(name)
            cm.__enter__()
            _stack.append(cm)

        # stage-boundary checkpoint/resume (SURVEY.md §5): stage_NN.npz
        # holds the exact state after stage NN; the next run with the
        # same checkpoint_dir resumes at NN+1
        start_stage = 0
        if opt.checkpoint_dir:
            start_stage, tracks = _maybe_resume(
                opt.checkpoint_dir, scene, view_graph, tracks)

        def ckpt(idx):
            if opt.checkpoint_dir:
                _write_stage_checkpoint(opt.checkpoint_dir, idx, scene,
                                        view_graph, tracks)

        # kick off the 33 MB per-match feature-id upload for the stage-2
        # inlier sweep now: on real scenes it hides fully under
        # preprocessing + view-graph calibration (the background thread
        # uploads in ~4 MB pieces so later small host pulls interleave —
        # processors/pair_inliers.prefetch_match_features)
        # Gate on stages 0/1 actually running: when both are skipped the
        # next work is relpose PREP, whose small blocking uploads must
        # not queue behind in-flight prefetch chunks — relpose.py kicks
        # the (idempotent) prefetch itself right after prep.
        stages_before_relpose = (
            (start_stage <= 0 and not opt.skip_preprocessing)
            or (start_stage <= 1 and not opt.skip_view_graph_calibration))
        if start_stage <= 2 and not opt.skip_relative_pose_estimation \
                and view_graph.num_matches > 0 and stages_before_relpose:
            from glomap_tpu.processors.pair_inliers import (
                prefetch_match_features)
            prefetch_match_features(view_graph)

        # 0. Preprocessing
        if start_stage <= 0 and not opt.skip_preprocessing:
            stage("preprocessing")
            from glomap_tpu.processors.view_graph_manipulation import (
                update_image_pairs_config, decompose_rel_pose,
                sparsify_graph)
            if opt.sparsify_expected_degree > 0:
                sparsify_graph(view_graph, scene,
                               opt.sparsify_expected_degree)
            update_image_pairs_config(scene, view_graph)
            decompose_rel_pose(scene, view_graph)

        ckpt(0)

        # 1. View graph calibration
        if start_stage <= 1 and not opt.skip_view_graph_calibration:
            stage("view graph calibration")
            from glomap_tpu.estimators.view_graph_calibration import (
                calibrate_view_graph)
            if not calibrate_view_graph(scene, view_graph, opt.opt_vgcalib):
                return None

        ckpt(1)

        # 2. Relative pose estimation
        if start_stage <= 2 and not opt.skip_relative_pose_estimation:
            stage("relative pose estimation")
            import time as _time
            _t0 = _time.monotonic()
            undistort_images(scene)
            _t1 = _time.monotonic()
            from glomap_tpu.estimators.relpose import estimate_relative_poses
            estimate_relative_poses(scene, view_graph, opt.opt_relpose)
            _t2 = _time.monotonic()
            image_pairs_inlier_count(scene, view_graph,
                                     opt.inlier_thresholds)
            _t3 = _time.monotonic()
            logger.info("relpose substages: undistort %.1fs, "
                        "estimate %.1fs, inlier-count %.1fs",
                        _t1 - _t0, _t2 - _t1, _t3 - _t2)
            rpf.filter_inlier_num(view_graph,
                                  opt.inlier_thresholds.min_inlier_num)
            rpf.filter_inlier_ratio(view_graph,
                                    opt.inlier_thresholds.min_inlier_ratio)
            if view_graph.keep_largest_connected_component(scene) == 0:
                logger.error("no connected components are found")
                return None

        ckpt(2)

        # 3. Rotation averaging (filter pass + final pass)
        if start_stage <= 3 and not opt.skip_rotation_averaging:
            stage("rotation averaging")
            ra_opts = RotationAveragerOptions(**{
                f: getattr(opt.opt_ra, f)
                for f in opt.opt_ra.__dataclass_fields__})
            solve_rotation_averaging(scene, view_graph, ra_opts,
                                     mesh=mesh)
            rpf.filter_rotations(scene, view_graph,
                                 opt.inlier_thresholds.max_rotation_error)
            if view_graph.keep_largest_connected_component(scene) == 0:
                logger.error("no connected components are found")
                return None
            if not solve_rotation_averaging(scene, view_graph, ra_opts,
                                     mesh=mesh):
                return None
            rpf.filter_rotations(scene, view_graph,
                                 opt.inlier_thresholds.max_rotation_error)
            num_img = view_graph.keep_largest_connected_component(scene)
            if num_img == 0:
                logger.error("no connected components are found")
                return None
            logger.info("%d / %d images within the connected component",
                        num_img, scene.num_images)

        ckpt(3)

        # 4. Track establishment and selection
        if start_stage <= 4 and not opt.skip_track_establishment:
            stage("track establishment")
            tracks_full = te.establish_full_tracks(scene, view_graph,
                                                   opt.opt_track)
            tracks = te.find_tracks_for_problem(scene, tracks_full,
                                                opt.opt_track)
            logger.info("Before filtering: %d, after filtering: %d",
                        tracks_full.num_tracks, tracks.num_tracks)
        if tracks is None:
            tracks = Tracks()
        ckpt(4)

        # 5. Global positioning
        if start_stage <= 5 and not opt.skip_global_positioning:
            stage("global positioning")
            if opt.opt_gp.constraint_type != "ONLY_POINTS":
                logger.error("Only points are used for camera positions")
                return None
            undistort_images(scene)
            if not solve_global_positioning(scene, view_graph, tracks,
                                            opt.opt_gp, mesh=mesh):
                return None
            tf.filter_tracks_by_angle(scene, tracks,
                                      opt.inlier_thresholds.max_angle_error)
            tf.filter_tracks_by_triangulation_angle(
                scene, tracks, opt.inlier_thresholds.min_triangulation_angle)
            tf.filter_tracks_by_reprojection(
                scene, tracks,
                10 * opt.inlier_thresholds.max_reprojection_error)
            normalize_reconstruction(scene, tracks)
            # GP random-init death spiral: a frame LM never pulled in
            # fails every filter above and ends obs-less; re-position it
            # from its neighbor pair directions so stage-7 completion
            # can recover its observations
            from glomap_tpu.estimators.global_positioning import (
                rescue_unplaced_frames)
            rescue_unplaced_frames(scene, view_graph, tracks)

        ckpt(5)

        # 6. Iterated staged bundle adjustment
        if start_stage <= 6 and not opt.skip_bundle_adjustment:
            stage("bundle adjustment")
            ite = 0
            while ite < opt.num_iteration_bundle_adjustment:
                prev_cam_params = scene.cam_params.copy()
                ba_opts_tr = _copy_opts(opt.opt_ba)
                ba_opts_tr.optimize_rotations = False
                if not solve_bundle_adjustment(scene, tracks, ba_opts_tr,
                                               mesh=mesh):
                    return None
                logger.info("BA iter %d/%d stage 1 done (position only)",
                            ite + 1, opt.num_iteration_bundle_adjustment)
                if opt.opt_ba.optimize_rotations and \
                        not solve_bundle_adjustment(scene, tracks,
                                                    opt.opt_ba, mesh=mesh):
                    return None
                logger.info("BA iter %d/%d stage 2 done", ite + 1,
                            opt.num_iteration_bundle_adjustment)

                normalize_reconstruction(scene, tracks)

                # BA moved the intrinsics: refresh the undistorted rays
                # BEFORE the normalized-space reprojection filter, which
                # compares against rays lifted with the current focals
                # (reference re-runs UndistortImages inside the loop,
                # global_mapper.cc:237-238) — skipped only when the
                # params are bit-identical (optimize_intrinsics=False)
                _refresh_rays(scene, prev_cam_params)

                # progressive filtering with early exit (<0.1% filtered)
                status = True
                filtered_num = 0
                while status and ite < opt.num_iteration_bundle_adjustment:
                    scaling = max(3 - ite, 1)
                    filtered_num += tf.filter_tracks_by_reprojection(
                        scene, tracks,
                        scaling * opt.inlier_thresholds.max_reprojection_error)
                    if filtered_num > 1e-3 * max(tracks.num_tracks, 1):
                        status = False
                    else:
                        ite += 1
                if status:
                    logger.info("fewer than 0.1%% tracks filtered, stop")
                    break

            # final filter at the tight threshold, against rays lifted
            # with the FINAL intrinsics (global_mapper.cc:263-264)
            tf.filter_tracks_by_reprojection(
                scene, tracks, opt.inlier_thresholds.max_reprojection_error)
            tf.filter_tracks_by_triangulation_angle(
                scene, tracks, opt.inlier_thresholds.min_triangulation_angle)

        ckpt(6)

        # 7. Retriangulation
        if start_stage <= 7 and not opt.skip_retriangulation:
            stage("retriangulation")
            from glomap_tpu.controllers.retriangulation import (
                merge_tracks, retriangulate_tracks)
            for _ in range(opt.num_iteration_retriangulation):
                tracks = retriangulate_tracks(scene, view_graph, tracks,
                                              opt.opt_triangulator)
                # refinement rounds (colmap ba_global_max_refinements
                # loop inside track_retriangulation.cc:99-122): BA, then
                # complete + merge tracks against the refined geometry
                # (colmap CompleteAndMergeTracks), then filter; stop when
                # <0.05% changed
                prev_keys = None
                for _ref in range(5):
                    prev_cam_params = scene.cam_params.copy()
                    if not solve_bundle_adjustment(scene, tracks,
                                                   opt.opt_ba, mesh=mesh):
                        return None
                    # intrinsics moved -> refresh rays before the
                    # complete/merge/filter passes (mirrors the
                    # re-undistortion the reference's colmap BA loop
                    # performs, global_mapper.cc:237-238)
                    _refresh_rays(scene, prev_cam_params)
                    num_obs = max(int(tracks.obs_valid.sum()), 1)
                    tf.complete_tracks(
                        scene, tracks,
                        opt.opt_triangulator.tri_complete_max_reproj_error)
                    merge_tracks(
                        scene, view_graph, tracks,
                        opt.opt_triangulator.tri_merge_max_reproj_error)
                    tf.filter_tracks_by_reprojection(
                        scene, tracks,
                        opt.inlier_thresholds.max_reprojection_error)
                    # NET end-of-round change (reference counts gross
                    # complete+merge+filter events, which double-counts
                    # the observations that oscillate between the loose
                    # completion and the tight filter threshold every
                    # round and so never converges below the 0.05% exit;
                    # the fixed point of the round map is the honest
                    # "reconstruction stopped changing" signal). Compared
                    # as the canonical set of valid (track, keypoint)
                    # keys — merge/complete re-sort and grow the flat obs
                    # arrays, so a position-wise mask comparison would
                    # see a permutation as change
                    keys = _valid_obs_keys(scene, tracks)
                    if prev_keys is not None:
                        changed = len(np.setxor1d(keys, prev_keys,
                                                  assume_unique=True))
                        if changed < 5e-4 * num_obs:
                            break
                    prev_keys = keys
            normalize_reconstruction(scene, tracks)
            tf.filter_tracks_by_reprojection(
                scene, tracks, opt.inlier_thresholds.max_reprojection_error)
            tf.filter_tracks_by_triangulation_angle(
                scene, tracks, opt.inlier_thresholds.min_triangulation_angle)

        ckpt(7)

        # frames that end with zero valid observations carry no
        # geometric support — drop them from the output instead of
        # writing a junk pose (estimators/global_positioning.py)
        from glomap_tpu.estimators.global_positioning import (
            deregister_unsupported_frames)
        deregister_unsupported_frames(scene, tracks)

        # 8. Pruning
        if start_stage <= 8 and not opt.skip_pruning:
            stage("pruning")
            from glomap_tpu.processors.pruning import (
                prune_weakly_connected_images)
            prune_weakly_connected_images(scene, tracks)

        while _stack:
            _stack.pop().__exit__(None, None, None)
        logger.info("stage summary:\n%s", timer.summary())
        return tracks


def _copy_opts(o):
    import copy
    return copy.deepcopy(o)


def _write_stage_checkpoint(ckpt_dir: str, stage_idx: int, scene, vg,
                            tracks) -> None:
    """stage_NN.npz = exact pipeline state after stage NN completed."""
    import os
    from glomap_tpu.io.checkpoint import save_checkpoint
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"stage_{stage_idx:02d}.npz")
    save_checkpoint(path, scene, vg, tracks,
                    next_stage=np.int64(stage_idx + 1))
    logger.info("checkpoint written: %s", path)


def _copy_state_into(dst, src) -> None:
    """Rebind every dataclass field of dst to src's arrays and drop any
    derived device/host caches keyed on the old arrays."""
    import dataclasses
    for f in dataclasses.fields(dst):
        setattr(dst, f.name, getattr(src, f.name))
    for cache in ("_kp_rayT_dev", "_kp_xyT_dev", "_match_kp_cache",
                  "_full_tracks_cache"):
        if hasattr(dst, cache):
            setattr(dst, cache, None)


def _maybe_resume(ckpt_dir: str, scene, vg, tracks):
    """Load the latest stage_NN.npz from ckpt_dir (if any) into the
    caller's scene/view-graph objects; returns (start_stage, tracks)."""
    import glob
    import os
    from glomap_tpu.io.checkpoint import load_checkpoint
    found = sorted(glob.glob(os.path.join(ckpt_dir, "stage_*.npz")))
    if not found:
        return 0, tracks
    path = found[-1]
    scene2, vg2, tracks2, extra = load_checkpoint(path)
    _copy_state_into(scene, scene2)
    if vg2 is not None:
        _copy_state_into(vg, vg2)
    start_stage = int(extra.get("next_stage", 0))
    logger.info("resuming from checkpoint %s at stage %d", path,
                start_stage)
    return start_stage, (tracks2 if tracks2 is not None else tracks)


def _refresh_rays(scene: Scene, prev_cam_params: np.ndarray) -> None:
    """Re-lift keypoint rays when BA moved the intrinsics (the
    normalized-space filters and retriangulation consume scene.kp_ray,
    which must be lifted with the CURRENT camera params — reference
    global_mapper.cc:237-238,263-264 re-runs UndistortImages)."""
    if np.array_equal(prev_cam_params, scene.cam_params):
        return
    undistort_images(scene)


def _valid_obs_keys(scene: Scene, tracks: Tracks) -> np.ndarray:
    """Canonical identity of the valid observation set: sorted unique
    (track, global-keypoint) keys, permutation-invariant under the obs
    re-sorts that complete/merge perform."""
    ok = tracks.obs_valid & tracks.valid[tracks.obs_track]
    kp = (scene.kp_offset[tracks.obs_image[ok]] +
          tracks.obs_feature[ok]).astype(np.int64)
    return np.unique(tracks.obs_track[ok].astype(np.int64) *
                     np.int64(scene.num_keypoints) + kp)
