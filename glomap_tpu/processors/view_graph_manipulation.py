"""View-graph preprocessing: pair-config promotion + relative-pose
decomposition.

Counterpart of glomap/processors/view_graph_manipulation.{h,cc}:
  UpdateImagePairsConfig (:178-238) — promote UNCALIBRATED pairs to
    CALIBRATED when both cameras are majority-calibrated (>50% of their
    prior-focal pairs already CALIBRATED), recomputing F from the pose.
  DecomposeRelPose (:240-313) — re-derive cam2_from_cam1 from E by
    cheirality-voted decomposition over the pair's matches (batched on
    device instead of the reference's CPU thread pool), normalize the
    translation, flag pure-rotation pairs.
  SparsifyGraph / EstablishStrongClusters (:10-177) — random edge
    subsampling to a target degree and union-find strong clustering.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from glomap_tpu.math import two_view as tv
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import (
    ViewGraph, CONFIG_CALIBRATED, CONFIG_UNCALIBRATED, CONFIG_PLANAR,
    CONFIG_PANORAMIC, CONFIG_PLANAR_OR_PANORAMIC)

logger = logging.getLogger(__name__)


def update_image_pairs_config(scene: Scene, vg: ViewGraph) -> int:
    """Promote UNCALIBRATED pairs between majority-calibrated cameras."""
    if vg.num_pairs == 0:
        return 0
    prior = scene.cam_has_prior_focal
    ci = scene.image_camera[vg.pair_i]
    cj = scene.image_camera[vg.pair_j]
    both_prior = vg.pair_valid & prior[ci] & prior[cj]
    is_cal = both_prior & (vg.pair_config == CONFIG_CALIBRATED)
    is_uncal = both_prior & (vg.pair_config == CONFIG_UNCALIBRATED)

    # bincounts, not np.add.at (an interpreted per-element loop —
    # BENCH_NOTES round-4 host-filter discipline)
    C = scene.num_cameras
    calib = (np.bincount(ci[is_cal], minlength=C)
             + np.bincount(cj[is_cal], minlength=C)).astype(np.float64)
    total = calib + np.bincount(ci[is_uncal], minlength=C) \
        + np.bincount(cj[is_uncal], minlength=C)
    cam_ok = np.divide(calib, total, out=np.zeros_like(calib),
                       where=total > 0) > 0.5

    promote = is_uncal & cam_ok[ci] & cam_ok[cj]
    idx = np.nonzero(promote)[0]
    if len(idx):
        vg.pair_config[idx] = CONFIG_CALIBRATED
        # recompute F from pose + intrinsics
        K1i = np.asarray(tv.calib_matrix_inv(
            scene.cam_params[ci[idx], 0], scene.cam_params[ci[idx], 1],
            scene.cam_params[ci[idx], 2], scene.cam_params[ci[idx], 3]))
        K2i = np.asarray(tv.calib_matrix_inv(
            scene.cam_params[cj[idx], 0], scene.cam_params[cj[idx], 1],
            scene.cam_params[cj[idx], 2], scene.cam_params[cj[idx], 3]))
        F = tv.fundamental_from_motion(K1i, K2i, vg.pair_quat[idx],
                                       vg.pair_trans[idx])
        vg.pair_F[idx] = F
        logger.info("Promoted %d pairs to CALIBRATED", len(idx))
    return len(idx)


def decompose_rel_pose(scene: Scene, vg: ViewGraph,
                       pure_rotation_thres: float = 1e-3) -> int:
    """Re-derive relative poses for pairs with calibrated cameras:
    E-decomposition (cheirality-voted) for CALIBRATED pairs, Malis-Vargas
    H-decomposition for PLANAR / PANORAMIC / PLANAR_OR_PANORAMIC pairs,
    with pure-rotation reclassification to PANORAMIC (t = 0) — the
    counterpart of colmap EstimateTwoViewGeometryPose inside
    view_graph_manipulation.cc:240-313. Returns the number of
    pure-rotation pairs detected."""
    if vg.num_pairs == 0:
        return 0
    from glomap_tpu.estimators.relpose import (_cheirality_tab,
                                               _choose_pose_tab,
                                               _sampson_tab)
    from glomap_tpu.processors.undistortion import undistort_images

    prior = scene.cam_has_prior_focal
    ci = scene.image_camera[vg.pair_i]
    cj = scene.image_camera[vg.pair_j]
    both_prior = vg.pair_valid & prior[ci] & prior[cj]
    use_e = both_prior & (vg.pair_config == CONFIG_CALIBRATED)
    use_h = both_prior & ((vg.pair_config == CONFIG_PLANAR) |
                          (vg.pair_config == CONFIG_PANORAMIC) |
                          (vg.pair_config == CONFIG_PLANAR_OR_PANORAMIC))
    use = use_e | use_h
    if not use.any():
        return 0

    if not scene.kp_ray.any():
        undistort_images(scene)

    # pack bounded per-pair tables (same layout as the RANSAC scorer)
    P = vg.num_pairs
    cap = 512
    rng_np = np.random.default_rng(0)
    keys = rng_np.random(vg.num_matches)
    order = np.lexsort((keys, vg.match_pair))
    ranks = np.empty(vg.num_matches, dtype=np.int64)
    ranks[order] = np.arange(vg.num_matches) - \
        vg.pair_match_offset[vg.match_pair[order]]
    sel = ranks < cap
    mp_s = vg.match_pair[sel]
    rank_s = ranks[sel]
    kp1 = scene.kp_offset[vg.pair_i[mp_s]] + vg.match_f1[sel]
    kp2 = scene.kp_offset[vg.pair_j[mp_s]] + vg.match_f2[sel]
    tabs = np.zeros((6, P, cap))
    tabs[0:3, mp_s, rank_s] = scene.kp_ray[kp1].T
    tabs[3:6, mp_s, rank_s] = scene.kp_ray[kp2].T
    mask_np = np.zeros((P, cap), dtype=bool)
    mask_np[mp_s, rank_s] = (use[mp_s] & vg.match_inlier[sel])
    tabs[2][~mask_np] = 1.0
    tabs[5][~mask_np] = 1.0
    tab = tuple(jnp.asarray(tabs[k]) for k in range(6))
    q, t = _choose_pose_tab(jnp.asarray(vg.pair_E), tab,
                            jnp.asarray(mask_np))
    q = np.asarray(q)
    t = np.asarray(t)
    tn = np.linalg.norm(t, axis=-1)
    t = np.where(tn[:, None] > 1e-12, t / np.maximum(tn[:, None], 1e-12), t)
    vg.pair_quat[use_e] = q[use_e]
    vg.pair_trans[use_e] = t[use_e]

    n_pure = 0
    if use_h.any():
        import jax
        from glomap_tpu.math import rotation as rotm
        from glomap_tpu.math import two_view as tv
        from glomap_tpu.math.homography import decompose_homography
        idx_h = np.nonzero(use_h)[0]
        # calibrated homography: Hn = K2^-1 H K1
        K1 = np.asarray(tv.calib_matrix(
            scene.cam_params[ci[idx_h], 0], scene.cam_params[ci[idx_h], 1],
            scene.cam_params[ci[idx_h], 2], scene.cam_params[ci[idx_h], 3]))
        K2i = np.asarray(tv.calib_matrix_inv(
            scene.cam_params[cj[idx_h], 0], scene.cam_params[cj[idx_h], 1],
            scene.cam_params[cj[idx_h], 2], scene.cam_params[cj[idx_h], 3]))
        Hn = K2i @ vg.pair_H[idx_h] @ K1
        R4, t4, n4, pure = decompose_homography(
            Hn, pure_rot_eps=pure_rotation_thres)
        # candidate selection on the pair tables: cheirality AND epipolar
        # (Sampson) consistency — cheirality alone cannot separate the
        # two Malis solution families when matches are off-plane; the
        # true pose is the one whose E = [t]x R fits the actual matches
        tab_h = tuple(a[idx_h] for a in tab)
        mask_h = jnp.asarray(mask_np[idx_h])
        sq_thr = 1e-4  # (1e-2 normalized reproj)^2, types.h defaults
        votes = []
        for k in range(4):
            Rk = R4[:, k]
            tk = t4[:, k]
            R9 = jnp.asarray(Rk.reshape(-1, 9))
            ch = _cheirality_tab(R9, jnp.asarray(tk), tab_h) & mask_h
            tx = np.zeros_like(Rk)
            tx[:, 0, 1] = -tk[:, 2]
            tx[:, 0, 2] = tk[:, 1]
            tx[:, 1, 0] = tk[:, 2]
            tx[:, 1, 2] = -tk[:, 0]
            tx[:, 2, 0] = -tk[:, 1]
            tx[:, 2, 1] = tk[:, 0]
            E9 = jnp.asarray((tx @ Rk).reshape(-1, 9))
            samp_ok = _sampson_tab(E9, tab_h) < sq_thr
            votes.append(np.asarray(jnp.sum(ch & samp_ok, axis=1)))
        k_best = np.argmax(np.stack(votes), axis=0)
        Rh = R4[np.arange(len(idx_h)), k_best]
        th = t4[np.arange(len(idx_h)), k_best]
        thn = np.linalg.norm(th, axis=-1)
        is_pure = pure | (thn <= pure_rotation_thres)
        th = np.where(is_pure[:, None], 0.0,
                      th / np.maximum(thn[:, None], 1e-12))
        vg.pair_quat[idx_h] = np.asarray(rotm.rotmat_to_quat(
            jnp.asarray(Rh)))
        vg.pair_trans[idx_h] = th
        # reclassify: pure rotation -> PANORAMIC (excluded from
        # translation constraints downstream); otherwise the pair's
        # H-derived pose is as good as calibrated
        vg.pair_config[idx_h[is_pure]] = CONFIG_PANORAMIC
        vg.pair_config[idx_h[~is_pure]] = CONFIG_CALIBRATED
        n_pure = int(is_pure.sum())

    logger.info("Decomposed %d pairs (%d pure rotation)", int(use.sum()),
                n_pure)
    return n_pure


def sparsify_graph(vg: ViewGraph, scene: Scene, expected_degree: int = 50,
                   seed: int = 1) -> int:
    """Randomly subsample edges of over-connected nodes to a target degree
    (counterpart of SparsifyGraph, view_graph_manipulation.cc:10-68).
    Edge keep probability min(1, expected_degree / min(deg_i, deg_j))."""
    if vg.num_pairs == 0:
        return 0
    rng = np.random.default_rng(seed)
    deg = np.bincount(vg.pair_i[vg.pair_valid],
                      minlength=scene.num_images) \
        + np.bincount(vg.pair_j[vg.pair_valid],
                      minlength=scene.num_images)
    dmin = np.minimum(deg[vg.pair_i], deg[vg.pair_j])
    p_keep = np.minimum(1.0, expected_degree / np.maximum(dmin, 1))
    drop = vg.pair_valid & (rng.uniform(size=vg.num_pairs) > p_keep)
    vg.pair_valid &= ~drop
    n = int(drop.sum())
    if n:
        logger.info("Sparsified view graph: dropped %d pairs", n)
    return n


def strong_cluster_labels(num_nodes: int, f1: np.ndarray, f2: np.ndarray,
                          w: np.ndarray, thres: float,
                          weak_factor: float = 0.75,
                          min_weak_links: int = 2,
                          rounds: int = 10) -> np.ndarray:
    """Shared strong-clustering core (EstablishStrongClusters,
    view_graph_manipulation.cc:70-177): connected components over edges
    with w > thres, then iterative merging of clusters joined by at least
    `min_weak_links` slightly-weaker edges (w >= weak_factor * thres).
    Fully vectorized (native connected components per round); used by
    both the view-graph clusterer and reconstruction pruning."""
    from glomap_tpu import native

    f1 = np.asarray(f1, np.int64)
    f2 = np.asarray(f2, np.int64)
    strong = w > thres
    acc_i = [f1[strong]]
    acc_j = [f2[strong]]
    labels = native.connected_components(
        num_nodes, acc_i[0], acc_j[0])
    weak = w >= weak_factor * thres
    for _ in range(rounds):
        ra = labels[f1]
        rb = labels[f2]
        cross = weak & (ra != rb)
        if not cross.any():
            break
        lo = np.minimum(ra[cross], rb[cross]).astype(np.int64)
        hi = np.maximum(ra[cross], rb[cross]).astype(np.int64)
        key = lo * num_nodes + hi
        uniq, n = np.unique(key, return_counts=True)
        mergeable = uniq[n >= min_weak_links]
        if len(mergeable) == 0:
            break
        acc_i.append((mergeable // num_nodes).astype(np.int64))
        acc_j.append((mergeable % num_nodes).astype(np.int64))
        labels = native.connected_components(
            num_nodes, np.concatenate(acc_i), np.concatenate(acc_j))
    return labels


def establish_strong_clusters(scene: Scene, vg: ViewGraph,
                              min_inliers: int = 30,
                              min_ratio: float = 0.25) -> np.ndarray:
    """Strong clustering over inlier-count pair weights (counterpart of
    EstablishStrongClusters with INLIER_NUM criteria,
    view_graph_manipulation.cc:70-177). Returns per-frame cluster labels
    (also stored in scene.frame_cluster)."""
    total = np.maximum(np.diff(vg.pair_match_offset), 1)
    ok = vg.pair_valid & (vg.pair_num_inliers / total >= min_ratio)
    fi = scene.image_frame[vg.pair_i[ok]]
    fj = scene.image_frame[vg.pair_j[ok]]
    w = vg.pair_num_inliers[ok].astype(np.float64)
    labels = strong_cluster_labels(scene.num_frames, fi, fj, w,
                                   thres=float(min_inliers) - 1e-9)
    # relabel by decreasing cluster size so cluster 0 is the largest
    vals, counts = np.unique(labels, return_counts=True)
    order = vals[np.argsort(-counts)]
    remap = {int(v): k for k, v in enumerate(order)}
    labels = np.asarray([remap[int(v)] for v in labels], dtype=np.int32)
    scene.frame_cluster[:] = labels
    return labels
