"""Batched RANSAC relative pose estimation over all pairs simultaneously.

Counterpart of glomap/estimators/relpose_estimation.{h,cc}
(EstimateRelativePoses via PoseLib LO-RANSAC, 50k iterations max, run on a
CPU thread pool over pairs in 10 chunks).

TPU-first re-design: instead of per-pair adaptive RANSAC, ALL pairs draw
fixed-size hypothesis batches in parallel:
  1. sample 8 matches per (pair, hypothesis); build the epipolar
     constraint matrix from undistorted rays; smallest eigenvector of
     A^T A (batched 9x9 eigh) -> E candidate; project to the essential
     manifold (batched 3x3 SVD)
  2. score every candidate against ALL of its pair's matches with squared
     Sampson error (gather by pair + segment-sum) — the dense
     O(pairs x hypotheses x matches) sweep that maps perfectly onto the
     VPU; hypothesis rounds keep peak memory bounded
  3. best-per-pair E -> 4 (R, t) decompositions -> cheirality vote over
     all matches -> pose
  4. local optimization: ~10 batched LM steps on (rotation tangent,
     translation sphere tangent) minimizing robust Sampson error over all
     pairs at once (5x5 per-pair normal equations, vectorized
     accept/reject)

All cameras use their current intrinsics to lift pixels to rays, matching
the reference's strategy of undistorting through the (possibly
calibrated-by-stage-1) camera models (relpose_estimation.cc:66-97).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import RelPoseEstimationOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math import two_view as tv
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import ViewGraph


def _essential_candidates(r1, r2):
    """8 ray pairs (..., 8, 3) each -> essential matrix (..., 3, 3).

    Nullspace of the stacked epipolar constraints via eigh of A^T A,
    then projection to the essential manifold (sigma = (1, 1, 0))."""
    # row_k = kron(x1_k, x2_k): x2^T E x1 = sum_ij E_ij x2_i x1_j
    A = (r2[..., :, :, None] * r1[..., :, None, :]).reshape(
        r1.shape[:-2] + (8, 9))
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[..., :, 0]  # smallest eigenvalue
    E = e.reshape(e.shape[:-1] + (3, 3))
    U, S, Vt = jnp.linalg.svd(E)
    sigma = jnp.asarray([1.0, 1.0, 0.0], dtype=E.dtype)
    return U @ (sigma[..., None] * Vt)


def _decompose_E(E):
    """E -> 4 candidate (quat, t) with t unit (standard U W V^T recipe)."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep rotations proper
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    qs = jnp.stack([rotm.rotmat_to_quat(R1), rotm.rotmat_to_quat(R1),
                    rotm.rotmat_to_quat(R2), rotm.rotmat_to_quat(R2)],
                   axis=-2)  # (..., 4 cands, 4)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return qs, ts


@partial(jax.jit, static_argnames=("num_pairs", "hyp_per_round", "rounds"))
def _ransac_essential(key, ray1, ray2, ray1T, ray2T, match_pair,
                      match_valid, offsets, counts, sq_thres_pair,
                      num_pairs: int, hyp_per_round: int, rounds: int):
    """Returns (best_E (P,3,3), best_count (P,)).

    Scoring runs in lane-major layout (match axis trailing): per-match
    (3, 3) tensors tile-pad ~50x on TPU and OOM at city-scale match
    counts, so the per-hypothesis E is gathered as (9, M) rows instead.
    """
    dtype = ray1.dtype
    sq_thres_m = sq_thres_pair[match_pair]

    def one_round(carry, rkey):
        best_E, best_cnt = carry
        # sample (P, H, 8) match indices within each pair's range
        u = jax.random.randint(rkey, (num_pairs, hyp_per_round, 8), 0,
                               jnp.int32(2 ** 30))
        idx = offsets[:, None, None] + u % jnp.maximum(counts, 1)[:, None,
                                                                  None]
        r1 = ray1[idx]  # (P, H, 8, 3)
        r2 = ray2[idx]
        E = _essential_candidates(r1, r2)  # (P, H, 3, 3)

        # score every hypothesis against all its pair's matches
        def score_h(h):
            E9T = E[:, h].reshape(num_pairs, 9).T  # (9, P)
            E9_m = E9T[:, match_pair]  # (9, M) lane-major gather
            err = tv.sampson_error_sq_rows(E9_m, ray1T, ray2T)
            inl = (err < sq_thres_m) & match_valid
            return jax.ops.segment_sum(inl.astype(jnp.int32), match_pair,
                                       num_segments=num_pairs)

        # sequential over hypotheses keeps peak memory at O(M)
        cnts = jax.lax.map(score_h, jnp.arange(hyp_per_round))  # (H, P)
        h_best = jnp.argmax(cnts, axis=0)  # (P,)
        cnt_best = jnp.take_along_axis(cnts, h_best[None], axis=0)[0]
        E_best = E[jnp.arange(num_pairs), h_best]
        improve = cnt_best > best_cnt
        best_E = jnp.where(improve[:, None, None], E_best, best_E)
        best_cnt = jnp.where(improve, cnt_best, best_cnt)
        return (best_E, best_cnt), None

    keys = jax.random.split(key, rounds)
    init = (jnp.zeros((num_pairs, 3, 3), dtype),
            jnp.zeros((num_pairs,), jnp.int32))
    (best_E, best_cnt), _ = jax.lax.scan(one_round, init, keys)
    return best_E, best_cnt


def _cheirality_rows(R9_m, tT_m, x1T, x2T, min_depth=1e-2, max_depth=100.0):
    """check_cheirality in lane-major layout: R9_m (9, M) rotation rows,
    tT_m (3, M) translations, rays (3, M)."""
    Rx0 = R9_m[0] * x1T[0] + R9_m[1] * x1T[1] + R9_m[2] * x1T[2]
    Rx1 = R9_m[3] * x1T[0] + R9_m[4] * x1T[1] + R9_m[5] * x1T[2]
    Rx2 = R9_m[6] * x1T[0] + R9_m[7] * x1T[1] + R9_m[8] * x1T[2]
    a = -(Rx0 * x2T[0] + Rx1 * x2T[1] + Rx2 * x2T[2])
    b1 = -(Rx0 * tT_m[0] + Rx1 * tT_m[1] + Rx2 * tT_m[2])
    b2 = x2T[0] * tT_m[0] + x2T[1] * tT_m[1] + x2T[2] * tT_m[2]
    lam1 = b1 - a * b2
    lam2 = -a * b1 + b2
    scale = 1.0 - a * a
    lo = min_depth * scale
    hi = max_depth * scale
    return (lam1 > lo) & (lam2 > lo) & (lam1 < hi) & (lam2 < hi)


@partial(jax.jit, static_argnames=("num_pairs",))
def _choose_pose(best_E, ray1T, ray2T, match_pair, match_valid,
                 num_pairs: int):
    """Decompose E and pick the candidate with the best cheirality vote
    (lane-major sweep per candidate)."""
    qs, ts = _decompose_E(best_E)  # (P, 4, 4), (P, 4, 3)

    def votes(k):
        R9T = rotm.quat_to_rotmat(qs[:, k]).reshape(num_pairs, 9).T
        tT = ts[:, k].T  # (3, P)
        ch = _cheirality_rows(R9T[:, match_pair], tT[:, match_pair],
                              ray1T, ray2T) & match_valid
        return jax.ops.segment_sum(ch.astype(jnp.int32), match_pair,
                                   num_segments=num_pairs)

    v = jax.lax.map(votes, jnp.arange(4))  # (4, P)
    k_best = jnp.argmax(v, axis=0)
    q = qs[jnp.arange(num_pairs), k_best]
    t = ts[jnp.arange(num_pairs), k_best]
    return rotm.quat_normalize(q), t


def _tangent_basis(t):
    """(..., 3) unit vectors -> two orthonormal tangent vectors."""
    # pick the axis least aligned with t
    a = jnp.where(jnp.abs(t[..., :1]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], t.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(t, b1)
    return b1, b2


@partial(jax.jit, static_argnames=("num_pairs", "num_iters"))
def _refine_poses(q0, t0, ray1T, ray2T, match_pair, match_valid,
                  sq_thres_pair, num_pairs: int, num_iters: int):
    """Batched LM on (rotation tangent, translation sphere) per pair,
    minimizing truncated squared Sampson error (the LO step of LO-RANSAC).

    Lane-major throughout: the per-match Jacobian J (5, M) comes from the
    chain rule dr/dz = (dr/dE9) (dE9/dz) where dE9/dz is a tiny per-pair
    (9, 5) tensor (jacfwd over pairs) and each dr/dz_k is one jvp of the
    rows-form Sampson sweep.
    """
    dtype = t0.dtype
    sq_thres_m = sq_thres_pair[match_pair]
    valid_f = match_valid.astype(dtype)

    def E9_of(q, t, b1, b2, z):
        q2 = rotm.quat_mul(q, rotm.so3_exp_quat(z[0:3]))
        t2 = t + z[3] * b1 + z[4] * b2
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
        return tv.essential_from_motion(q2, t2).reshape(9)

    def cost_of(q, t):
        E9T = jax.vmap(lambda qq, tt: tv.essential_from_motion(
            qq, tt).reshape(9))(q, t).T  # (9, P)
        err = tv.sampson_error_sq_rows(E9T[:, match_pair], ray1T, ray2T)
        capped = jnp.minimum(err, sq_thres_m) * valid_f
        return jax.ops.segment_sum(capped, match_pair,
                                   num_segments=num_pairs)

    def lm_step(state, _):
        q, t, lam, cost = state
        b1, b2 = _tangent_basis(t)
        z0 = jnp.zeros((num_pairs, 5), dtype)
        # per-pair E9 and dE9/dz (P, 9, 5) — tiny
        E9 = jax.vmap(E9_of)(q, t, b1, b2, z0)  # (P, 9)
        dE9 = jax.vmap(jax.jacfwd(E9_of, argnums=4))(q, t, b1, b2, z0)
        E9_m = E9.T[:, match_pair]  # (9, M)

        r2 = tv.sampson_error_sq_rows(E9_m, ray1T, ray2T)
        r = jnp.sqrt(jnp.maximum(r2, 1e-18))
        inl = (r2 < sq_thres_m) & match_valid
        w = inl.astype(dtype)

        sampson = lambda e: tv.sampson_error_sq_rows(e, ray1T, ray2T)
        Jrows = []
        for k in range(5):
            tang = dE9[:, :, k].T[:, match_pair]  # (9, M)
            _, dr2 = jax.jvp(sampson, (E9_m,), (tang,))
            Jrows.append(dr2 / (2.0 * r))  # d sqrt(r2) / dz_k
        # per-pair normal equations from (5, M) rows
        H = jnp.zeros((num_pairs, 5, 5), dtype)
        g = jnp.zeros((num_pairs, 5), dtype)
        for a in range(5):
            g = g.at[:, a].set(jax.ops.segment_sum(
                w * r * Jrows[a], match_pair, num_segments=num_pairs))
            for b in range(a, 5):
                hab = jax.ops.segment_sum(w * Jrows[a] * Jrows[b],
                                          match_pair,
                                          num_segments=num_pairs)
                H = H.at[:, a, b].set(hab)
                if b != a:
                    H = H.at[:, b, a].set(hab)
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        H = H + ((lam[:, None] * diag + 1e-10)[..., None] *
                 jnp.eye(5, dtype=dtype))
        dz = -jnp.linalg.solve(H, g[..., None])[..., 0]

        q_new = rotm.quat_normalize(
            rotm.quat_mul(q, rotm.so3_exp_quat(dz[:, 0:3])))
        t_new = t + dz[:, 3:4] * b1 + dz[:, 4:5] * b2
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new, axis=-1,
                                                    keepdims=True), 1e-12)
        new_cost = cost_of(q_new, t_new)
        accept = new_cost < cost
        q = jnp.where(accept[:, None], q_new, q)
        t = jnp.where(accept[:, None], t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e6))
        return (q, t, lam, cost), None

    state = (q0, t0, jnp.full((num_pairs,), 1e-3, dtype), cost_of(q0, t0))
    (q, t, _, _), _ = jax.lax.scan(lm_step, state, None, length=num_iters)
    return q, t


def estimate_relative_poses(scene: Scene, vg: ViewGraph,
                            opts: RelPoseEstimationOptions | None = None,
                            dtype=None, seed: int = 1) -> None:
    """Re-estimate cam2_from_cam1 for every valid pair; updates
    vg.pair_quat/pair_trans (and pair_E). Requires scene.kp_ray."""
    opts = opts or RelPoseEstimationOptions()
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    if vg.num_pairs == 0:
        return
    kp1 = scene.kp_offset[vg.pair_i[vg.match_pair]] + vg.match_f1
    kp2 = scene.kp_offset[vg.pair_j[vg.match_pair]] + vg.match_f2
    ray1 = jnp.asarray(scene.kp_ray[kp1], dtype=dtype)
    ray2 = jnp.asarray(scene.kp_ray[kp2], dtype=dtype)
    ray1T = jnp.asarray(np.ascontiguousarray(scene.kp_ray[kp1].T),
                        dtype=dtype)
    ray2T = jnp.asarray(np.ascontiguousarray(scene.kp_ray[kp2].T),
                        dtype=dtype)
    match_pair = jnp.asarray(vg.match_pair)
    match_valid = jnp.asarray(vg.pair_valid[vg.match_pair])
    offsets = jnp.asarray(vg.pair_match_offset[:-1].astype(np.int64))
    counts = jnp.asarray(np.diff(vg.pair_match_offset).astype(np.int64))

    # normalized Sampson threshold per pair (same conversion as inlier
    # scoring: px * 0.5 * (1/f1 + 1/f2))
    from glomap_tpu.ops import camera_models as cmod
    f1 = cmod.mean_focal(scene.cam_params[scene.image_camera[vg.pair_i]])
    f2 = cmod.mean_focal(scene.cam_params[scene.image_camera[vg.pair_j]])
    thres = opts.max_epipolar_error * 0.5 * (1.0 / f1 + 1.0 / f2)
    sq_thres = jnp.asarray(thres * thres, dtype=dtype)

    P = vg.num_pairs
    hyp_per_round = 64
    rounds = max(1, min(opts.num_hypotheses, 4096) // hyp_per_round)
    key = jax.random.PRNGKey(seed)
    best_E, best_cnt = _ransac_essential(
        key, ray1, ray2, ray1T, ray2T, match_pair, match_valid, offsets,
        counts, sq_thres, P, hyp_per_round, rounds)
    q, t = _choose_pose(best_E, ray1T, ray2T, match_pair, match_valid, P)
    q, t = _refine_poses(q, t, ray1T, ray2T, match_pair, match_valid,
                         sq_thres, P, opts.refine_num_lm_iters)

    vg.pair_quat = np.array(q, dtype=np.float64, copy=True)
    vg.pair_trans = np.array(t, dtype=np.float64, copy=True)
    E = tv.essential_from_motion(q, t)
    vg.pair_E = np.array(E, dtype=np.float64, copy=True)
