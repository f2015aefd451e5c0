"""Gravity prior refinement from view-graph consistency.

Counterpart of glomap/estimators/gravity_refinement.{h,cc}
(GravityRefiner): (1) identify error-prone frames — those whose
gravity-aligned relative rotations deviate from their closest upright
rotation by > max_gravity_error against >= max_outlier_ratio of their
neighbors; (2) for each such frame, collect the gravities implied by each
gravity-carrying neighbor (rotate the neighbor's aligned up-axis through
the relative rotation), average them (principal direction), and refine on
the sphere with a robust (arctan) IRLS loop; accept if the refined
gravity agrees with a majority of neighbors.

Everything is batched with NO per-frame Python loop: the consistency
pass is one vectorized sweep over pairs; neighbor collection is a single
flatten of both pair directions keyed by compact prone-frame id; the
principal-direction init is one batched 3x3 eigh; and the arctan-IRLS
runs in lockstep over all error-prone frames via bincount segment
reductions (the reference scans neighbors once too,
gravity_refinement.cc:129).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import GravityRefinerOptions
from glomap_tpu.math import gravity as gravm
from glomap_tpu.math import rotation as rotm
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


def _aligned_rel_angles(scene: Scene, vg: ViewGraph, use: np.ndarray):
    """Angle between gravity-aligned relative rotation and its closest
    upright rotation, per selected pair."""
    f_i = scene.image_frame[vg.pair_i[use]]
    f_j = scene.image_frame[vg.pair_j[use]]
    A_i = gravm.align_rot(scene.frame_gravity[f_i])
    A_j = gravm.align_rot(scene.frame_gravity[f_j])
    if A_i.ndim == 2:
        A_i, A_j = A_i[None], A_j[None]
    R_rel = rotm.quat_to_rotmat(vg.pair_quat[use])
    # conjugate sensor rotations onto frames
    s_i = scene.image_sensor[vg.pair_i[use]]
    s_j = scene.image_sensor[vg.pair_j[use]]
    S_i = rotm.quat_to_rotmat(scene.sensor_quat[s_i])
    S_j = rotm.quat_to_rotmat(scene.sensor_quat[s_j])
    R_f = np.swapaxes(S_j, -1, -2) @ R_rel @ S_i
    G = np.swapaxes(A_j, -1, -2) @ R_f @ A_i
    theta = gravm.closest_up_angle(np.eye(3), G)
    G_up = gravm.angle_to_rot_up(theta)
    ang = rotm.rotation_angle_rad(np.swapaxes(G_up, -1, -2) @ G)
    return f_i, f_j, np.degrees(ang)


def refine_gravity(scene: Scene, vg: ViewGraph,
                   opts: GravityRefinerOptions | None = None) -> int:
    """Refine suspicious gravity priors in place. Returns #rectified."""
    opts = opts or GravityRefinerOptions()
    has_g = scene.frame_has_gravity
    use = vg.pair_valid & has_g[scene.image_frame[vg.pair_i]] & \
        has_g[scene.image_frame[vg.pair_j]]
    if not use.any():
        return 0

    f_i, f_j, ang = _aligned_rel_angles(scene, vg, use)
    F = scene.num_frames
    total = np.bincount(f_i, minlength=F) + np.bincount(f_j, minlength=F)
    is_bad = ang > opts.max_gravity_error
    bad = np.bincount(f_i[is_bad], minlength=F) + \
        np.bincount(f_j[is_bad], minlength=F)
    error_prone = (total >= opts.min_num_neighbors) & \
        (bad / np.maximum(total, 1) >= opts.max_outlier_ratio)
    n_prone = int(error_prone.sum())
    logger.info("Number of error prone frames: %d", n_prone)
    if n_prone == 0:
        return 0

    # implied gravity of frame f from neighbor n with relative rotation
    # R(n<-f): g_f_implied = R(n<-f)^T @ A_n[:, 1] (neighbor's aligned up)
    s_i = scene.image_sensor[vg.pair_i[use]]
    s_j = scene.image_sensor[vg.pair_j[use]]
    R_rel = rotm.quat_to_rotmat(vg.pair_quat[use])
    S_i = rotm.quat_to_rotmat(scene.sensor_quat[s_i])
    S_j = rotm.quat_to_rotmat(scene.sensor_quat[s_j])
    R_f = np.swapaxes(S_j, -1, -2) @ R_rel @ S_i  # frame_j <- frame_i
    A_i = gravm.align_rot(scene.frame_gravity[f_i])
    A_j = gravm.align_rot(scene.frame_gravity[f_j])
    if A_i.ndim == 2:
        A_i, A_j = A_i[None], A_j[None]
    # gravity of i implied by j, and of j implied by i
    g_i_impl = np.einsum("pji,pj->pi", R_f, A_j[:, :, 1])
    g_j_impl = np.einsum("pij,pj->pi", R_f, A_i[:, :, 1])

    # One batched pass over ALL error-prone frames (the reference scans
    # neighbors once, gravity_refinement.cc:129; the per-frame f_i == f
    # rescans here were O(n_prone * E) — quadratic on a city graph with
    # thousands of flagged frames). Both directions of every pair flatten
    # into one observation list keyed by compact prone-frame id; every
    # per-frame reduction is a bincount, the principal-direction init is
    # one batched 3x3 eigh, and the arctan-IRLS runs lockstep for all
    # frames simultaneously.
    cos_thr = np.cos(np.deg2rad(2 * opts.max_gravity_error))
    loss_c = 1.0 - np.cos(np.deg2rad(opts.max_gravity_error))
    prone = np.nonzero(error_prone)[0]
    K = len(prone)
    cid = np.full(F, -1, dtype=np.int64)
    cid[prone] = np.arange(K)
    obs_frame = np.concatenate([f_i, f_j])
    obs_g = np.concatenate([g_i_impl, g_j_impl])
    sel = error_prone[obs_frame]
    oc = cid[obs_frame[sel]]
    obs_g = obs_g[sel]
    cnt = np.bincount(oc, minlength=K)
    eligible = cnt >= opts.min_num_neighbors
    # init: per-frame principal direction (batched average_gravity,
    # gravity.cc:37-95) with sign majority vote
    M = np.empty((K, 3, 3))
    for a in range(3):
        for b in range(a, 3):
            M[:, a, b] = M[:, b, a] = np.bincount(
                oc, weights=obs_g[:, a] * obs_g[:, b], minlength=K)
    _, vecs = np.linalg.eigh(M)
    g = vecs[..., -1]  # (K, 3)
    neg = np.bincount(oc, weights=(np.einsum("oi,oi->o", obs_g, g[oc])
                                   < 0).astype(np.float64), minlength=K)
    g = np.where((neg > cnt / 2)[:, None], -g, g)
    # robust sphere refinement: IRLS with arctan loss on |g - obs|^2,
    # all frames in lockstep (a frame at its fixed point recomputes the
    # same iterate — equivalent to the per-frame early break)
    for _ in range(20):
        r2 = np.sum((g[oc] - obs_g) ** 2, axis=-1)
        w = 1.0 / (1.0 + (r2 / loss_c) ** 2)  # arctan-loss IRLS weight
        g_new = np.stack([np.bincount(oc, weights=w * obs_g[:, c],
                                      minlength=K) for c in range(3)],
                         axis=-1)
        nrm = np.linalg.norm(g_new, axis=-1, keepdims=True)
        g_new = np.where(nrm >= 1e-12, g_new / np.maximum(nrm, 1e-12), g)
        done = np.einsum("ki,ki->k", g_new, g) > 1 - 1e-14
        g = g_new
        if done.all():
            break
    n_out = np.bincount(oc, weights=(np.einsum("oi,oi->o", obs_g, g[oc])
                                     < cos_thr).astype(np.float64),
                        minlength=K)
    accept = eligible & (n_out / np.maximum(cnt, 1)
                         < opts.max_outlier_ratio)
    scene.frame_gravity[prone[accept]] = g[accept]
    n_rect = int(accept.sum())
    logger.info("Number of rectified frames: %d / %d", n_rect, n_prone)
    return n_rect
