"""Batched multi-view triangulation.

TPU-native counterpart of the colmap triangulation machinery used by the
reference's retriangulation stage (glomap/controllers/
track_retriangulation.cc:21-116, colmap IncrementalMapper::
TriangulateImage): every track is triangulated simultaneously by the
midpoint method — for observations with world ray directions d_o from
centers c_o, solve the 3x3 system
    [sum_o (I - d_o d_o^T)] X = sum_o (I - d_o d_o^T) c_o
assembled with segment-sums and solved with batched 3x3 linear solves.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm
from glomap_tpu.scene.arrays import Scene, Tracks


@partial(jax.jit, static_argnames=("num_tracks", "sorted_width",
                                   "force_sorted"))
def midpoint_triangulate(obs_track, d, c, w, num_tracks: int,
                         sorted_width: int = 0,
                         force_sorted: bool = False):
    """obs_track (O,), d unit world directions (O,3), c centers (O,3),
    w per-obs weights (O,). Returns (X (T,3), ok (T,)).

    With sorted_width > 0 (host-computed block_width_for_sorted of the
    track-sorted obs axis) on TPU, the normal-equation assembly rides
    ONE 9-row sorted-window Pallas rowsum instead of two (O,3,3)/(O,3)
    scatter-adds (TPU scatter ~1 ms per 100k rows — CLAUDE.md).
    force_sorted runs that path on CPU in Pallas interpret mode so tests
    can assert its exact equivalence with the segment_sum fallback."""
    dtype = d.dtype
    eye = jnp.eye(3, dtype=dtype)
    from glomap_tpu.ops.pallas_kernels import (_on_tpu,
                                               sorted_segment_rowsum)
    interp = not _on_tpu()
    if sorted_width > 0 and (_on_tpu() or force_sorted):
        dT = d.T  # (3, O)
        cT = c.T
        # weighted P = w (I - d d^T): 6 unique symmetric comps + P c
        Pxx = w * (1.0 - dT[0] * dT[0])
        Pxy = -w * dT[0] * dT[1]
        Pxz = -w * dT[0] * dT[2]
        Pyy = w * (1.0 - dT[1] * dT[1])
        Pyz = -w * dT[1] * dT[2]
        Pzz = w * (1.0 - dT[2] * dT[2])
        b0 = Pxx * cT[0] + Pxy * cT[1] + Pxz * cT[2]
        b1 = Pxy * cT[0] + Pyy * cT[1] + Pyz * cT[2]
        b2 = Pxz * cT[0] + Pyz * cT[1] + Pzz * cT[2]
        rows = jnp.stack([Pxx, Pxy, Pxz, Pyy, Pyz, Pzz, b0, b1, b2])
        # exact (bf16x3): these sums ARE the normal equations — default
        # single-pass rounding moved triangulated points ~2e-3 on the
        # extent-10 bench scene (measured composed-vs-sorted A/B)
        s = sorted_segment_rowsum(rows, obs_track, num_tracks,
                                  sorted_width, exact=True,
                                  interpret=interp)  # (T, 9)
        A = jnp.stack([
            jnp.stack([s[:, 0], s[:, 1], s[:, 2]], axis=-1),
            jnp.stack([s[:, 1], s[:, 3], s[:, 4]], axis=-1),
            jnp.stack([s[:, 2], s[:, 4], s[:, 5]], axis=-1)], axis=-2)
        b = s[:, 6:9]
    else:
        P = eye - d[:, :, None] * d[:, None, :]
        Pw = w[:, None, None] * P
        A = jax.ops.segment_sum(Pw, obs_track, num_segments=num_tracks)
        b = jax.ops.segment_sum(jnp.einsum("oij,oj->oi", Pw, c),
                                obs_track, num_segments=num_tracks)
    # regularize rank-deficient systems (collinear rays)
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    A_reg = A + (1e-10 * jnp.maximum(tr, 1e-12))[:, None, None] * eye
    X = jnp.linalg.solve(A_reg, b[..., None])[..., 0]
    # well-posedness: smallest eigenvalue of A not tiny vs trace
    evals = jnp.linalg.eigvalsh(A)
    ok = evals[:, 0] > 1e-6 * jnp.maximum(tr, 1e-12)
    return X, ok


def _hash_u32(x):
    """Deterministic integer mix (Knuth multiplicative); replaces
    data-dependent RNG inside jit (Date-free, resume-safe)."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


@partial(jax.jit, static_argnames=("num_tracks", "num_hyps",
                                   "sorted_width", "force_sorted"))
def ransac_triangulate(obs_track, d, c, t_start, t_len, num_tracks: int,
                       num_hyps: int, cos_err_thresh, min_pair_angle_rad,
                       sorted_width: int = 0, force_sorted: bool = False):
    """Robust multi-view triangulation: per-track two-view RANSAC.

    TPU-native counterpart of colmap::EstimateTriangulation (LO-RANSAC over
    observation pairs with angular-error support), which the reference's
    retriangulation stage runs per point via IncrementalMapper::
    TriangulateImage (glomap/controllers/track_retriangulation.cc:63-80).
    Instead of per-point adaptive RANSAC, every track evaluates the same
    static budget of `num_hyps` deterministically-sampled observation
    pairs in one batched sweep: two-view midpoint hypotheses (T,3) per
    round, angular-support scoring of ALL observations against their
    track's hypothesis via one segment-sum, best-hypothesis selection by
    running max. Shapes are static; the obs axis is assumed sorted by
    track (track_establishment emits sorted obs).

    Args:
      obs_track (O,) int32 sorted; d (O,3) unit world ray directions;
      c (O,3) camera centers; t_start/t_len (T,) int32 segment offsets;
      cos_err_thresh: cos of max angular reprojection error (support);
      min_pair_angle_rad: minimum triangulation angle of the sample pair.
    Returns (X (T,3), support (T,), inlier (O,)).
    """
    dtype = d.dtype
    tids = jnp.arange(num_tracks, dtype=jnp.uint32)
    len_ = jnp.maximum(t_len, 1)
    len1 = jnp.maximum(t_len - 1, 1)
    cos_max_pair = jnp.cos(jnp.asarray(min_pair_angle_rad, dtype))
    # per-track enumeration offsets: short tracks sweep ALL ordered pairs
    # systematically (k < len*(len-1) is exhaustive); the hash phase
    # decorrelates which window long tracks explore
    h1 = (_hash_u32(tids * jnp.uint32(9781) + jnp.uint32(1))
          ).astype(jnp.int32) & 0x7FFFFFFF
    h2 = (_hash_u32(tids * jnp.uint32(7919) + jnp.uint32(7))
          ).astype(jnp.int32) & 0x7FFFFFFF

    from glomap_tpu.ops.pallas_kernels import (_on_tpu,
                                               sorted_segment_gather,
                                               sorted_segment_rowsum)
    use_sorted = sorted_width > 0 and (_on_tpu() or force_sorted)
    interp = not _on_tpu()
    dT = d.T  # (3, O) lane-major rows, built once for every hypothesis
    cT = c.T

    def score(X):
        # per-hypothesis sweep over ALL observations: with the sorted
        # obs axis this is one Pallas window gather + one 2-row window
        # rowsum per round instead of an XLA gather + two scatter-adds
        # (TPU scatter ~1 ms / 100k rows; this runs num_hyps times in
        # the scan below)
        if use_sorted:
            Xr = sorted_segment_gather(X, obs_track, sorted_width,
                                       interpret=interp)
            v0 = Xr[0] - cT[0]
            v1 = Xr[1] - cT[1]
            v2 = Xr[2] - cT[2]
            vn = jnp.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
            cos = (v0 * dT[0] + v1 * dT[1] + v2 * dT[2]) / \
                jnp.maximum(vn, 1e-12)
            inl = (cos > cos_err_thresh) & (vn > 1e-12)
            margin = jnp.where(inl, cos - cos_err_thresh,
                               0.0).astype(dtype)
            sums = sorted_segment_rowsum(
                jnp.stack([inl.astype(dtype), margin]), obs_track,
                num_tracks, sorted_width, interpret=interp)  # (T, 2)
            sup = sums[:, 0].astype(jnp.int32)
            msum = sums[:, 1]
            return sup, inl, margin, msum
        v = X[obs_track] - c
        vn = jnp.linalg.norm(v, axis=-1)
        cos = jnp.sum(v * d, axis=-1) / jnp.maximum(vn, 1e-12)
        inl = (cos > cos_err_thresh) & (vn > 1e-12)
        sup = jax.ops.segment_sum(inl.astype(jnp.int32), obs_track,
                                  num_segments=num_tracks)
        margin = jnp.where(inl, cos - cos_err_thresh, 0.0).astype(dtype)
        msum = jax.ops.segment_sum(margin, obs_track,
                                   num_segments=num_tracks)
        return sup, inl, margin, msum

    def hypothesis(k):
        i1 = (h1 + k // len1) % len_
        i2 = (i1 + 1 + (h2 + k) % len1) % len_
        o1 = jnp.clip(t_start + i1, 0, len(obs_track) - 1)
        o2 = jnp.clip(t_start + i2, 0, len(obs_track) - 1)
        d1, c1 = d[o1], c[o1]
        d2, c2 = d[o2], c[o2]
        # two-view ray midpoint: min_{s,t} |c1 + s d1 - c2 - t d2|
        b = c2 - c1
        d12 = jnp.sum(d1 * d2, axis=-1)
        denom = 1.0 - d12 * d12
        bd1 = jnp.sum(b * d1, axis=-1)
        bd2 = jnp.sum(b * d2, axis=-1)
        s = (bd1 - d12 * bd2) / jnp.maximum(denom, 1e-12)
        t = (d12 * bd1 - bd2) / jnp.maximum(denom, 1e-12)
        X = 0.5 * (c1 + s[:, None] * d1 + c2 + t[:, None] * d2)
        # eligibility: pair parallax above min angle, both depths positive
        # (cheirality, colmap TriangulatePoint), track has >= 2 obs
        ok = ((jnp.abs(d12) < cos_max_pair) & (s > 0) & (t > 0)
              & (t_len >= 2))
        return X, ok, o1, o2

    def body(carry, k):
        best_score, best_sup, best_X = carry
        X, ok, o1, o2 = hypothesis(k)
        sup, inl, margin, msum = score(X)
        # rank by support OUTSIDE the sample pair (a bad pair always
        # self-supports with 2), tie-broken by consensus tightness; the
        # margin sum is < 1 by construction (<= O_max * (1 - cos_thresh))
        sup_ex = (sup - inl[o1].astype(jnp.int32)
                  - inl[o2].astype(jnp.int32)).astype(dtype)
        msum_ex = msum - margin[o1] - margin[o2]
        sc = jnp.where(ok, sup_ex + msum_ex / (1.0 + msum_ex), -1.0)
        better = sc > best_score
        best_X = jnp.where(better[:, None], X, best_X)
        best_sup = jnp.where(better, sup, best_sup)
        best_score = jnp.maximum(best_score, sc)
        return (best_score, best_sup, best_X), None

    init = (jnp.full((num_tracks,), -jnp.inf, dtype),
            jnp.zeros((num_tracks,), jnp.int32),
            jnp.zeros((num_tracks, 3), dtype))
    (_, best_sup, best_X), _ = jax.lax.scan(body, init,
                                            jnp.arange(num_hyps))
    # local refinement: weighted midpoint over the winning consensus set
    _, inl, _, _ = score(best_X)
    X_ref, ok_ref = midpoint_triangulate(obs_track, d, c,
                                         inl.astype(dtype), num_tracks,
                                         sorted_width=sorted_width,
                                         force_sorted=force_sorted)
    refine = ok_ref & (best_sup >= 2)
    X_out = jnp.where(refine[:, None], X_ref, best_X)
    sup2, inl2, _, _ = score(X_out)
    worse = sup2 < best_sup  # keep the RANSAC point if refinement regressed
    X_out = jnp.where(worse[:, None], best_X, X_out)
    sup_out = jnp.where(worse, best_sup, sup2)
    inl_out = jnp.where(worse[obs_track], inl, inl2)
    return X_out, sup_out, inl_out


def ransac_triangulate_tracks(scene: Scene, tracks: Tracks, dtype=None,
                              max_angle_error_deg: float = 2.0,
                              min_tri_angle_deg: float = 1.0,
                              num_hyps: int = 16) -> np.ndarray:
    """Robustly fill tracks.xyz; marks outlier observations invalid.

    Returns the per-track success mask (support >= 2). Observations are
    assumed sorted by track within the valid subset (track_establishment
    order).
    """
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    if tracks.num_obs == 0:
        return np.zeros(tracks.num_tracks, dtype=bool)
    ob = tracks.obs_valid & tracks.valid[tracks.obs_track]
    o_idx = np.nonzero(ob)[0]
    if len(o_idx) == 0:
        return np.zeros(tracks.num_tracks, dtype=bool)
    o_img = tracks.obs_image[o_idx]
    kp = scene.kp_offset[o_img] + tracks.obs_feature[o_idx]
    q_img, t_img = scene.image_cam_from_world()
    # numpy host prep; the batched solves below are the device work
    d_np = rotm.quat_rotate(rotm.quat_conj(q_img[o_img]), scene.kp_ray[kp])
    centers = scene.image_centers()[o_img]
    ot = tracks.obs_track[o_idx].astype(np.int32)
    # segment offsets (obs sorted by track; empty tracks get len 0)
    t_len = np.bincount(ot, minlength=tracks.num_tracks).astype(np.int32)
    t_start = (np.concatenate([[0], np.cumsum(t_len)[:-1]])).astype(np.int32)
    # bucket-pad obs and track axes so retriangulation rounds reuse the
    # compiled solver: padded obs carry zero rays (never inliers) under a
    # fresh pad track id (keeps ids sorted); pad tracks have t_len 0 so
    # no hypothesis is ever eligible
    from glomap_tpu.utils.padding import bucket_size, pad_axis0
    n_obs = len(o_idx)
    n_tr = tracks.num_tracks
    n_tr_pad = bucket_size(max(n_tr, 1), 64)
    n_obs_pad = bucket_size(max(n_obs, 1))
    d_np = pad_axis0(np.asarray(d_np), n_obs_pad)
    centers = pad_axis0(np.asarray(centers), n_obs_pad)
    ot_p = pad_axis0(ot, n_obs_pad, fill=n_tr_pad - 1)
    t_len = pad_axis0(t_len, n_tr_pad)
    t_start = pad_axis0(t_start, n_tr_pad, fill=n_obs)
    from glomap_tpu.ops.segment_ops import axis_window
    X, sup, inl = ransac_triangulate(
        jnp.asarray(ot_p), jnp.asarray(d_np, dtype=dtype),
        jnp.asarray(centers, dtype=dtype),
        jnp.asarray(t_start), jnp.asarray(t_len), n_tr_pad,
        num_hyps, float(np.cos(np.deg2rad(max_angle_error_deg))),
        float(np.deg2rad(min_tri_angle_deg)),
        sorted_width=axis_window(ot_p))
    X = np.asarray(X, dtype=np.float64)[:n_tr]
    sup = np.asarray(sup)[:n_tr]
    ok = sup >= 2
    tracks.xyz[:] = np.where(ok[:, None], X, tracks.xyz)
    inl = np.asarray(inl)[:n_obs]
    drop = o_idx[~inl & ok[ot]]
    tracks.obs_valid[drop] = False
    return ok


def triangulate_tracks(scene: Scene, tracks: Tracks,
                       dtype=None) -> np.ndarray:
    """Fill tracks.xyz from current poses + rays; returns per-track
    well-posedness mask."""
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    if tracks.num_obs == 0:
        return np.zeros(0, dtype=bool)
    ob = tracks.obs_valid
    o_img = tracks.obs_image[ob]
    kp = scene.kp_offset[o_img] + tracks.obs_feature[ob]
    q_img, t_img = scene.image_cam_from_world()
    d_np = rotm.quat_rotate(rotm.quat_conj(q_img[o_img]), scene.kp_ray[kp])
    centers = scene.image_centers()[o_img]
    # bucket-pad (zero-weight pad rows, pad track collects them) so
    # repeated calls across filter rounds reuse the compiled solver
    from glomap_tpu.utils.padding import bucket_size, pad_axis0
    n_obs = int(ob.sum())
    n_tr = tracks.num_tracks
    n_tr_pad = bucket_size(max(n_tr, 1), 64)
    n_obs_pad = bucket_size(max(n_obs, 1))
    w = pad_axis0(np.ones(n_obs), n_obs_pad)
    from glomap_tpu.ops.segment_ops import axis_window
    ot_p = pad_axis0(tracks.obs_track[ob].astype(np.int32), n_obs_pad,
                     fill=n_tr_pad - 1)
    X, ok = midpoint_triangulate(
        jnp.asarray(ot_p),
        jnp.asarray(pad_axis0(np.asarray(d_np), n_obs_pad), dtype=dtype),
        jnp.asarray(pad_axis0(np.asarray(centers), n_obs_pad), dtype=dtype),
        jnp.asarray(w, dtype=dtype), n_tr_pad,
        sorted_width=axis_window(ot_p))
    X = np.asarray(X, dtype=np.float64)[:n_tr]
    ok = np.array(ok, copy=True)[:n_tr]
    tracks.xyz[:] = np.where(ok[:, None], X, tracks.xyz)
    return ok
