"""Epipolar inlier classification over all matches in one device sweep.

Counterpart of glomap/processors/image_pair_inliers.{h,cc}
(ImagePairInliers::ScoreError + ImagePairsInlierCount): per-match squared
Sampson / homography-transfer errors with per-config thresholds and
cheirality / degeneracy checks, aggregated per pair. The reference loops
pairs on a CPU thread pool; here every match of every pair is scored in a
single batched computation — the dense O(pairs x matches) sweep the TPU
excels at.

All per-match work runs in lane-major layout (match axis trailing): on
TPU, per-match (3, 3) tensors tile-pad ~50x in memory, so the per-pair
E/F/H matrices are gathered as (9, M) coefficient rows instead.

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

# max matches per sweep invocation: the (53, M) expansion table plus the
# endpoint/score intermediates cost ~420 B/match of HBM peak — 12.6M
# matches ~ 5 GB, safely inside the 16 GB v5e alongside the resident
# keypoint/feature tables (the 47.7M-match single shot needed 20.4 GB)
_SWEEP_CHUNK_MATCHES = 12 << 20


@partial(jax.jit, static_argnames=("num_pairs", "num_matches",
                                   "mp_width", "chunked"))
def _score_matches(num_pairs, num_matches,
                   # per-pair arrays
                   config, pair_q, pair_t, pair_F, pair_H, pair_valid,
                   focal1, focal2,
                   # device-resident keypoints (lane-major) + compact
                   # per-match feature ids (uint16 when they fit)
                   offsets, pair_i, pair_j, kp_offset, f1c, f2c,
                   kp_rayT, kp_xyT,
                   # thresholds
                   thres_E, thres_F, thres_H,
                   # static max pair-id span of any 2048-match block
                   # (matches are pair-sorted; 0 = composed gathers)
                   mp_width: int = 0,
                   # chunked mode: the per-pair/per-match inputs are the
                   # FULL (padded) arrays and (p0, m0) select a
                   # pair-aligned window of num_pairs pairs / num_matches
                   # matches — every chunk shares ONE compiled graph
                   # (the monolithic sweep at 47.7M matches allocated a
                   # 9.9 GB (53, M) table and OOM'd the 16 GB chip)
                   chunked: bool = False, p0=None, m0=None):
    """Returns (packed match_inlier bits, pair_num_inliers, pair_score).

    Keypoints stay device-resident (3/2, K); per-match data comes from
    trailing-axis gathers by index vectors REBUILT ON DEVICE from the
    two uint16 feature-id rows (the (M,) int32 uploads were ~100 MB at
    8M matches) — and the inlier mask returns BIT-PACKED (M/8 bytes;
    the 8 MB bool download through the ~25 MB/s tunnel was the longest
    pole of the sweep).

    On TPU every per-pair -> per-match expansion rides ONE fused
    (P, 53)-table sorted-window Pallas gather and the per-pair
    reductions ride sorted-window rowsums (the match axis is sorted by
    pair): the composed lane-axis gathers of ~50 per-pair rows were 41%
    of the sweep's device profile at ~zero HBM utilization (~5 GB/s
    lane gathers, CLAUDE.md)."""
    from glomap_tpu.ops.pallas_kernels import (_on_tpu,
                                               sorted_segment_gather,
                                               sorted_segment_rowsum)
    use_sorted = mp_width > 0 and _on_tpu()
    dtype = kp_rayT.dtype

    if chunked:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, p0, num_pairs, 0)
        (config, pair_q, pair_t, pair_F, pair_H, pair_valid, focal1,
         focal2, pair_i, pair_j) = (
            sl(config), sl(pair_q), sl(pair_t), sl(pair_F), sl(pair_H),
            sl(pair_valid), sl(focal1), sl(focal2), sl(pair_i),
            sl(pair_j))
        # local CSR: chunk starts at a pair boundary so offsets[p0] ==
        # m0 exactly; pad pairs carry the repeated last offset -> empty
        # segments; pad MATCH rows (>= the clipped last offset) get
        # segment id >= num_pairs and drop out of every reduction
        # (segment_ids_from_offsets' searchsorted-parity semantics)
        offsets = jnp.clip(
            jax.lax.dynamic_slice_in_dim(offsets, p0, num_pairs + 1, 0)
            - m0, 0, num_matches)
        f1c = jax.lax.dynamic_slice_in_dim(f1c, m0, num_matches, 0)
        f2c = jax.lax.dynamic_slice_in_dim(f2c, m0, num_matches, 0)

    # lengths -> segment ids WITHOUT searchsorted (836 ms for the
    # vectorized binary search over 8.3M needles vs 27 ms for the
    # scatter+cumsum form — ops/segment_ops.segment_ids_from_offsets)
    from glomap_tpu.ops.segment_ops import segment_ids_from_offsets
    mp = segment_ids_from_offsets(offsets, num_matches)
    # per-PAIR keypoint bases first (P-sized), then one per-match gather
    # each — kp_offset[pair_i[mp]] is a CHAIN of two 8.3M-index gathers
    # and gather cost is per-index (~40-60 ms each at this scale)
    base1 = kp_offset[pair_i].astype(jnp.int32)
    base2 = kp_offset[pair_j].astype(jnp.int32)
    kp1 = base1[mp] + f1c.astype(jnp.int32)
    kp2 = base2[mp] + f2c.astype(jnp.int32)
    # ONE (5, K) fused gather per endpoint (ray ++ xy): the gather cost
    # is per-index, not per-byte (41 ms for (3,K) and (8,K) alike on the
    # v5e at 8.3M indices), so fusing ray+pixel rows halves the gather
    # count of the sweep
    kp5 = jnp.concatenate([kp_rayT, kp_xyT], axis=0)
    rows1 = kp5[:, kp1]
    rows2 = kp5[:, kp2]
    ray1T, ray2T = rows1[0:3], rows2[0:3]
    one_row = jnp.ones((1, kp1.shape[0]), kp_xyT.dtype)
    px1T = jnp.concatenate([rows1[3:5], one_row], axis=0)
    px2T = jnp.concatenate([rows2[3:5], one_row], axis=0)

    # ---- per-pair quantities (computed once per pair, P-sized) ----
    E9 = jax.vmap(lambda q, t: tv.essential_from_motion(q, t).reshape(9))(
        pair_q, pair_t)                      # (P, 9)
    R9 = jax.vmap(lambda q: rotm.quat_to_rotmat(q).reshape(9))(pair_q)
    thrE = thres_E * 0.5 * (1.0 / focal1 + 1.0 / focal2)
    # epipole proximity degeneracy (cos 3 deg)
    ep12 = pair_t
    ep12 = jnp.where(ep12[..., 2:3] < 0, -ep12, ep12)
    ep12 = ep12 / jnp.maximum(jnp.linalg.norm(ep12, axis=-1, keepdims=True),
                              1e-12)
    qi, ti = rotm.rigid_inverse(pair_q, pair_t)
    ep21 = jnp.where(ti[..., 2:3] < 0, -ti, ti)
    ep21 = ep21 / jnp.maximum(jnp.linalg.norm(ep21, axis=-1, keepdims=True),
                              1e-12)
    epi = jnp.cross(pair_F[:, 0, :], pair_F[:, 2, :])
    epi_alt = jnp.cross(pair_F[:, 1, :], pair_F[:, 2, :])
    use_alt = jnp.max(jnp.abs(epi), axis=-1) <= 1e-12
    epi = jnp.where(use_alt[:, None], epi_alt, epi)
    is_E_p = config == CONFIG_CALIBRATED
    is_F_p = config == CONFIG_UNCALIBRATED
    is_H_p = (config == CONFIG_PLANAR) | (config == CONFIG_PANORAMIC) | \
        (config == CONFIG_PLANAR_OR_PANORAMIC)

    def expand(tab_P_k):
        """(P, k) per-pair table -> (k, M) per-match rows."""
        if use_sorted:
            return sorted_segment_gather(tab_P_k.astype(dtype), mp,
                                         mp_width)
        return tab_P_k.astype(dtype).T[:, mp]

    def reduce_rows(vals_k_M):
        """(k, M) -> (P, k) per-pair sums."""
        if use_sorted:
            return sorted_segment_rowsum(vals_k_M, mp, num_pairs,
                                         mp_width)
        return jax.ops.segment_sum(vals_k_M.T, mp,
                                   num_segments=num_pairs)

    tab = jnp.concatenate([
        E9,                                   # 0:9
        R9,                                   # 9:18
        pair_t,                               # 18:21
        ep21,                                 # 21:24
        ep12,                                 # 24:27
        pair_F.reshape(num_pairs, 9),         # 27:36
        epi,                                  # 36:39
        pair_H.reshape(num_pairs, 9),         # 39:48
        (thrE * thrE)[:, None],               # 48
        pair_valid[:, None].astype(E9.dtype),  # 49
        is_E_p[:, None].astype(E9.dtype),     # 50
        is_F_p[:, None].astype(E9.dtype),     # 51
        is_H_p[:, None].astype(E9.dtype),     # 52
    ], axis=1)
    rows = expand(tab)
    E9_m, R9_m, t_m = rows[0:9], rows[9:18], rows[18:21]
    e21T, e12T = rows[21:24], rows[24:27]
    F9_m, epiT, H9_m = rows[27:36], rows[36:39], rows[39:48]
    sq_thrE_m = rows[48]
    valid_m = rows[49] > 0.5
    is_E = rows[50] > 0.5
    is_F = rows[51] > 0.5
    is_H = rows[52] > 0.5

    # ---- Essential (rays, normalized threshold) ----
    r2_E = tv.sampson_error_sq_rows(E9_m, ray1T, ray2T)
    from glomap_tpu.estimators.relpose import _cheirality_rows
    cheir = _cheirality_rows(R9_m, t_m, ray1T, ray2T,
                             min_depth=1e-2, max_depth=100.0)
    cos3 = jnp.cos(jnp.deg2rad(3.0)) + 1e-6
    d1 = ray1T[0] * e21T[0] + ray1T[1] * e21T[1] + ray1T[2] * e21T[2]
    d2 = ray2T[0] * e12T[0] + ray2T[1] * e12T[1] + ray2T[2] * e12T[2]
    near_epipole = (d1 >= cos3) | (d2 >= cos3)
    ok_E = (r2_E < sq_thrE_m) & cheir & ~near_epipole

    # ---- Fundamental (pixels) ----
    sq_thrF = thres_F * thres_F
    r2_F = tv.sampson_error_sq_rows(F9_m, px1T, px2T)
    pre_F = r2_F < sq_thrF
    # orientation signum majority vote per pair
    # signum rows: s1 = F00 x2 + F10 y2 + F20; s2 = e1 - e2 * y1
    s1 = F9_m[0] * px2T[0] + F9_m[3] * px2T[1] + F9_m[6]
    s2 = epiT[1] - epiT[2] * px1T[1]
    sig = s1 * s2
    votes = jnp.where(pre_F & is_F, jnp.sign(sig), 0.0)
    vote_sum = reduce_rows(votes[None, :])[:, 0]
    tie_maj = jnp.stack([(vote_sum == 0).astype(E9.dtype),
                         jnp.sign(vote_sum)], axis=1)  # (P, 2)
    tm_rows = expand(tie_maj)
    ok_F = pre_F & (jnp.sign(sig) == tm_rows[1]) & ~(tm_rows[0] > 0.5)

    # ---- Homography (pixels) ----
    sq_thrH = thres_H * thres_H
    Hx0 = H9_m[0] * px1T[0] + H9_m[1] * px1T[1] + H9_m[2]
    Hx1 = H9_m[3] * px1T[0] + H9_m[4] * px1T[1] + H9_m[5]
    Hx2 = H9_m[6] * px1T[0] + H9_m[7] * px1T[1] + H9_m[8]
    zi = 1.0 / (Hx2 + 1e-12)
    r2_H = (Hx0 * zi - px2T[0]) ** 2 + (Hx1 * zi - px2T[1]) ** 2
    ok_H = r2_H < sq_thrH

    inlier = jnp.where(is_E, ok_E, jnp.where(is_F, ok_F, ok_H & is_H))
    inlier = inlier & valid_m

    r2 = jnp.where(is_E, jnp.minimum(r2_E, sq_thrE_m),
                   jnp.where(is_F, jnp.minimum(r2_F, sq_thrF),
                             jnp.minimum(r2_H, sq_thrH)))
    cap = jnp.where(is_E, sq_thrE_m,
                    jnp.where(is_F, sq_thrF, sq_thrH))
    score_m = jnp.where(inlier, r2, cap)

    sums = reduce_rows(jnp.stack([inlier.astype(dtype), score_m]))
    n_inl = sums[:, 0].astype(jnp.int32)
    score = sums[:, 1]
    return jnp.packbits(inlier), n_inl, score


def prefetch_match_features(vg: ViewGraph) -> None:
    """Kick off the (2 x M) compact feature-id upload on a background
    thread and cache the device arrays on the view graph. Through the
    tunneled PJRT client jnp.asarray BLOCKS on the transfer (measured:
    an inline prefetch just moved ~1 s from the inlier sweep into the
    relpose prep), so the upload runs off-thread and
    _join_match_features() collects it where it's consumed."""
    if vg.num_matches == 0 or \
            getattr(vg, "_match_fdev_thread", None) is not None or \
            getattr(vg, "_match_fdev", None) is not None:
        return
    import threading
    fdt = np.uint16 if (vg.match_f1.max(initial=0) < 2 ** 16 and
                        vg.match_f2.max(initial=0) < 2 ** 16) else np.int32
    f1 = vg.match_f1.astype(fdt)
    f2 = vg.match_f2.astype(fdt)

    def upload():
        # chunked transfer (~4 MB pieces): the tunnel serializes whole
        # transfers, so a monolithic 16.6 MB put makes every concurrent
        # small host pull (the adaptive-RANSAC best-count syncs) wait
        # ~0.5-1.3 s for it to drain; small pieces let those pulls
        # interleave. Device-side concatenate restores one array.
        step = max(1 << 21, 1)  # 2M rows (4 MB at uint16)
        out = []
        for arr in (f1, f2):
            pieces = [jnp.asarray(arr[i:i + step])
                      for i in range(0, len(arr), step)]
            out.append(pieces[0] if len(pieces) == 1
                       else jnp.concatenate(pieces))
        vg._match_fdev = tuple(out)

    th = threading.Thread(target=upload, daemon=True)
    th.start()
    vg._match_fdev_thread = th


def _join_match_features(vg: ViewGraph):
    th = getattr(vg, "_match_fdev_thread", None)
    if th is not None:
        th.join()
        vg._match_fdev_thread = None
    if getattr(vg, "_match_fdev", None) is None:
        fdt = np.uint16 if (vg.match_f1.max(initial=0) < 2 ** 16 and
                            vg.match_f2.max(initial=0) < 2 ** 16) \
            else np.int32
        vg._match_fdev = (jnp.asarray(vg.match_f1.astype(fdt)),
                          jnp.asarray(vg.match_f2.astype(fdt)))
    return vg._match_fdev


def image_pairs_inlier_count(scene: Scene, vg: ViewGraph,
                             opts: InlierThresholds | None = None) -> None:
    """Classify every match, update vg.match_inlier / pair_num_inliers.

    Requires scene.kp_ray (run processors.undistortion first) for
    CALIBRATED pairs.
    """
    opts = opts or InlierThresholds()
    if vg.num_matches == 0:
        return
    import logging
    import time as _time
    _t0 = _time.monotonic()
    from glomap_tpu.processors.undistortion import device_keypoints
    kp_rayT, kp_xyT = device_keypoints(scene)
    # compact upload: uint16 feature ids when they fit (they do unless an
    # image has >65535 keypoints), int32 otherwise; reuses the prefetch
    # started before the RANSAC phase when available
    f1d, f2d = _join_match_features(vg)
    _t1 = _time.monotonic()
    from glomap_tpu.ops import camera_models as cm
    f1 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_i]])
    f2 = cm.mean_focal(scene.cam_params[scene.image_camera[vg.pair_j]])

    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    mp_width = block_width_for_sorted(vg.match_pair)
    thrs = (float(opts.max_epipolar_error_E),
            float(opts.max_epipolar_error_F),
            float(opts.max_epipolar_error_H))
    if vg.num_matches <= _SWEEP_CHUNK_MATCHES:
        packed, n_inl, score = _score_matches(
            vg.num_pairs, vg.num_matches,
            jnp.asarray(vg.pair_config), jnp.asarray(vg.pair_quat),
            jnp.asarray(vg.pair_trans), jnp.asarray(vg.pair_F),
            jnp.asarray(vg.pair_H), jnp.asarray(vg.pair_valid),
            jnp.asarray(np.asarray(f1)), jnp.asarray(np.asarray(f2)),
            jnp.asarray(vg.pair_match_offset), jnp.asarray(vg.pair_i),
            jnp.asarray(vg.pair_j), jnp.asarray(scene.kp_offset),
            f1d, f2d,
            kp_rayT, kp_xyT, *thrs, mp_width=mp_width)
        _t2 = _time.monotonic()
        inlier = np.unpackbits(
            np.asarray(packed), count=vg.num_matches).astype(bool)
        n_inl_np = np.array(n_inl, dtype=np.int64, copy=True)
        out = np.array(score, dtype=np.float64, copy=True)
    else:
        # pair-aligned chunks through ONE compiled graph: the monolithic
        # sweep materializes (53, M) + endpoint tables and OOMs the
        # 16 GB chip near ~30M matches (measured 20.4 GB at 47.7M)
        M_c = _SWEEP_CHUNK_MATCHES
        off = vg.pair_match_offset
        bounds = [0]
        while off[bounds[-1]] < vg.num_matches:
            nxt = int(np.searchsorted(off, off[bounds[-1]] + M_c,
                                      side="right")) - 1
            if nxt <= bounds[-1]:
                raise ValueError(
                    f"pair {bounds[-1]} has more than {M_c} matches")
            bounds.append(min(nxt, vg.num_pairs))
        from glomap_tpu.utils.padding import bucket_size
        P_cap = bucket_size(max(int(np.diff(bounds).max()), 1), 64)
        padP = lambda a: jnp.asarray(np.pad(
            np.asarray(a), [(0, P_cap)] + [(0, 0)] * (a.ndim - 1)))
        d_cfg, d_q, d_t = (padP(vg.pair_config), padP(vg.pair_quat),
                           padP(vg.pair_trans))
        d_F, d_H = padP(vg.pair_F), padP(vg.pair_H)
        d_val = padP(vg.pair_valid)
        d_f1m = padP(np.asarray(f1))
        d_f2m = padP(np.asarray(f2))
        d_pi, d_pj = padP(vg.pair_i), padP(vg.pair_j)
        d_off = jnp.asarray(np.pad(off, (0, P_cap), mode="edge"))
        zpad = jnp.zeros((M_c,), f1d.dtype)
        f1d_p = jnp.concatenate([f1d, zpad])
        f2d_p = jnp.concatenate([f2d, zpad])
        kp_off_d = jnp.asarray(scene.kp_offset)
        outs = []
        for k in range(len(bounds) - 1):
            p0, p1 = bounds[k], bounds[k + 1]
            m0 = int(off[p0])
            outs.append(_score_matches(
                P_cap, M_c, d_cfg, d_q, d_t, d_F, d_H, d_val,
                d_f1m, d_f2m, d_off, d_pi, d_pj, kp_off_d,
                f1d_p, f2d_p, kp_rayT, kp_xyT, *thrs,
                mp_width=mp_width, chunked=True,
                p0=jnp.asarray(p0, jnp.int32),
                m0=jnp.asarray(m0, jnp.int32)))
        _t2 = _time.monotonic()
        inlier = np.empty(vg.num_matches, dtype=bool)
        n_inl_np = np.empty(vg.num_pairs, dtype=np.int64)
        out = np.empty(vg.num_pairs, dtype=np.float64)
        for k, (packed, n_inl, score) in enumerate(outs):
            p0, p1 = bounds[k], bounds[k + 1]
            m0, m1 = int(off[p0]), int(off[p1])
            bits = np.unpackbits(np.asarray(packed), count=M_c)
            inlier[m0:m1] = bits[:m1 - m0]
            n_inl_np[p0:p1] = np.asarray(n_inl)[:p1 - p0]
            out[p0:p1] = np.asarray(score)[:p1 - p0]
    vg.match_inlier = inlier
    vg.pair_num_inliers = n_inl_np
    logging.getLogger(__name__).debug(
        "inlier sweep: upload-join %.2fs, dispatch %.2fs, pull %.2fs",
        _t1 - _t0, _t2 - _t1, _time.monotonic() - _t2)
    return out
