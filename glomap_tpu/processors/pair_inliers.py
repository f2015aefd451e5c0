"""Epipolar inlier classification over all matches in one device sweep.

Counterpart of glomap/processors/image_pair_inliers.{h,cc}
(ImagePairInliers::ScoreError + ImagePairsInlierCount): per-match squared
Sampson / homography-transfer errors with per-config thresholds and
cheirality / degeneracy checks, aggregated per pair. The reference loops
pairs on a CPU thread pool; here every match of every pair is scored in a
single batched computation (gathers by pair index + segment sums) — the
dense O(pairs x matches) sweep the TPU excels at.

Semantics matched to the reference:
  * CALIBRATED (E): squared Sampson on undistorted rays (z-normalized),
    threshold = max_epipolar_error_E * 0.5 * (1/f1 + 1/f2), PoseLib-style
    cheirality with depth in [1e-2, 100], epipole-proximity degeneracy
    check at cos(3 deg) (image_pair_inliers.cc:20-92).
  * UNCALIBRATED (F): squared Sampson in pixel space, orientation-signum
    majority vote as the cheirality test; a tie invalidates the pair
    (image_pair_inliers.cc:94-164).
  * PLANAR/PANORAMIC (H): squared transfer error (image_pair_inliers.cc
    :166-195).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import InlierThresholds
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math import two_view as tv
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import (
    ViewGraph, CONFIG_CALIBRATED, CONFIG_UNCALIBRATED, CONFIG_PLANAR,
    CONFIG_PANORAMIC, CONFIG_PLANAR_OR_PANORAMIC)


@partial(jax.jit, static_argnames=("num_pairs",))
def _score_matches(num_pairs,
                   # per-pair arrays
                   config, pair_q, pair_t, pair_F, pair_H, pair_valid,
                   focal1, focal2,
                   # per-match arrays
                   mp, ray1, ray2, px1, px2,
                   # thresholds
                   thres_E, thres_F, thres_H):
    """Returns (match_inlier, pair_num_inliers, pair_score)."""
    cfg_m = config[mp]
    valid_m = pair_valid[mp]

    # ---- Essential (rays, normalized threshold) ----
    E = tv.essential_from_motion(pair_q, pair_t)
    thrE = thres_E * 0.5 * (1.0 / focal1 + 1.0 / focal2)
    sq_thrE_m = (thrE * thrE)[mp]
    r2_E = tv.sampson_error_sq(E[mp], ray1, ray2)
    cheir = tv.check_cheirality(pair_q[mp], pair_t[mp], ray1, ray2,
                                min_depth=1e-2, max_depth=100.0)
    # epipole proximity degeneracy (cos 3 deg)
    ep12 = pair_t
    ep12 = jnp.where(ep12[..., 2:3] < 0, -ep12, ep12)
    ep12 = ep12 / jnp.maximum(jnp.linalg.norm(ep12, axis=-1, keepdims=True),
                              1e-12)
    qi, ti = rotm.rigid_inverse(pair_q, pair_t)
    ep21 = jnp.where(ti[..., 2:3] < 0, -ti, ti)
    ep21 = ep21 / jnp.maximum(jnp.linalg.norm(ep21, axis=-1, keepdims=True),
                              1e-12)
    cos3 = jnp.cos(jnp.deg2rad(3.0)) + 1e-6
    near_epipole = (jnp.sum(ray1 * ep21[mp], axis=-1) >= cos3) | \
        (jnp.sum(ray2 * ep12[mp], axis=-1) >= cos3)
    ok_E = (r2_E < sq_thrE_m) & cheir & ~near_epipole

    # ---- Fundamental (pixels) ----
    sq_thrF = thres_F * thres_F
    r2_F = tv.sampson_error_sq_2d(pair_F[mp], px1, px2)
    pre_F = r2_F < sq_thrF
    # orientation signum majority vote per pair
    epi = jnp.cross(pair_F[:, 0, :], pair_F[:, 2, :])
    epi_alt = jnp.cross(pair_F[:, 1, :], pair_F[:, 2, :])
    use_alt = jnp.max(jnp.abs(epi), axis=-1) <= 1e-12
    epi = jnp.where(use_alt[:, None], epi_alt, epi)
    sig = tv.orientation_signum(pair_F[mp], epi[mp], px1, px2)
    is_F = cfg_m == CONFIG_UNCALIBRATED
    votes = jnp.where(pre_F & is_F, jnp.sign(sig), 0.0)
    vote_sum = jax.ops.segment_sum(votes, mp, num_segments=num_pairs)
    tie = vote_sum == 0
    maj = jnp.sign(vote_sum)
    ok_F = pre_F & (jnp.sign(sig) == maj[mp]) & ~tie[mp]

    # ---- Homography (pixels) ----
    sq_thrH = thres_H * thres_H
    r2_H = tv.homography_error_sq(pair_H[mp], px1, px2)
    ok_H = r2_H < sq_thrH

    is_E = cfg_m == CONFIG_CALIBRATED
    is_H = (cfg_m == CONFIG_PLANAR) | (cfg_m == CONFIG_PANORAMIC) | \
        (cfg_m == CONFIG_PLANAR_OR_PANORAMIC)

    inlier = jnp.where(is_E, ok_E, jnp.where(is_F, ok_F, ok_H & is_H))
    inlier = inlier & valid_m

    r2 = jnp.where(is_E, jnp.minimum(r2_E, sq_thrE_m),
                   jnp.where(is_F, jnp.minimum(r2_F, sq_thrF),
                             jnp.minimum(r2_H, sq_thrH)))
    cap = jnp.where(is_E, sq_thrE_m,
                    jnp.where(is_F, sq_thrF, sq_thrH))
    score_m = jnp.where(inlier, r2, cap)

    n_inl = jax.ops.segment_sum(inlier.astype(jnp.int32), mp,
                                num_segments=num_pairs)
    score = jax.ops.segment_sum(score_m, mp, num_segments=num_pairs)
    return inlier, n_inl, score


def image_pairs_inlier_count(scene: Scene, vg: ViewGraph,
                             opts: InlierThresholds | None = None) -> None:
    """Classify every match, update vg.match_inlier / pair_num_inliers.

    Requires scene.kp_ray (run processors.undistortion first) for
    CALIBRATED pairs.
    """
    opts = opts or InlierThresholds()
    if vg.num_matches == 0:
        return
    kp1 = scene.kp_offset[vg.pair_i[vg.match_pair]] + vg.match_f1
    kp2 = scene.kp_offset[vg.pair_j[vg.match_pair]] + vg.match_f2
    from glomap_tpu.ops import camera_models as cm
    f1 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_i]])
    f2 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_j]])

    inlier, n_inl, score = _score_matches(
        vg.num_pairs,
        jnp.asarray(vg.pair_config), jnp.asarray(vg.pair_quat),
        jnp.asarray(vg.pair_trans), jnp.asarray(vg.pair_F),
        jnp.asarray(vg.pair_H), jnp.asarray(vg.pair_valid),
        jnp.asarray(np.asarray(f1)), jnp.asarray(np.asarray(f2)),
        jnp.asarray(vg.match_pair), jnp.asarray(scene.kp_ray[kp1]),
        jnp.asarray(scene.kp_ray[kp2]), jnp.asarray(scene.kp_xy[kp1]),
        jnp.asarray(scene.kp_xy[kp2]),
        float(opts.max_epipolar_error_E), float(opts.max_epipolar_error_F),
        float(opts.max_epipolar_error_H))

    vg.match_inlier = np.array(inlier, copy=True)
    vg.pair_num_inliers = np.array(n_inl, dtype=np.int64, copy=True)
    return np.array(score, dtype=np.float64, copy=True)
