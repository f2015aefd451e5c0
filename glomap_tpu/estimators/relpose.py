"""Batched RANSAC relative pose estimation over all pairs simultaneously.

Counterpart of glomap/estimators/relpose_estimation.{h,cc}
(EstimateRelativePoses via PoseLib LO-RANSAC, 50k iterations max, run on a
CPU thread pool over pairs in 10 chunks).

TPU-first design. Matches are packed into PADDED PER-PAIR TABLES
(P, cap) — component arrays with the cap axis as trailing lanes — so the
entire RANSAC (sampling, scoring, cheirality voting, LO refinement) is
dense regular math with NO gathers or scatters in the hot loops:

  1. sample 8 matches per (pair, hypothesis) by within-row
     take_along_axis; 8-point nullspace by unrolled-Cholesky inverse
     iteration (ops/smallalg.min_eigvec9 — batched LAPACK eigh measured
     ~4 s for 316k 9x9 on TPU, this is microseconds); essential
     projection via analytic 3x3 eigendecomposition
  2. score every hypothesis against the pair tables: component-form
     Sampson sweep over (P, cap) + masked trailing-axis reduce
  3. best-per-pair E -> 4 closed-form (R, t) decompositions ->
     cheirality vote over the tables -> pose
  4. local optimization: batched LM on (rotation tangent, translation
     sphere) with Jacobians from the per-pair dE9/dz chain rule (5 jvps
     of the table Sampson sweep); 5x5 per-pair normal equations by
     trailing-axis reduction

Scoring/refinement use at most opts.score_match_cap matches per pair (the
FULL match set is classified downstream by processors/pair_inliers).
All cameras use their current intrinsics to lift pixels to rays, matching
the reference's strategy (relpose_estimation.cc:66-97).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import RelPoseEstimationOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math import two_view as tv
from glomap_tpu.ops import smallalg as sa
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import ViewGraph


# ---------------------------------------------------------------------------
# component-form geometry on (P, cap) tables; E9 (P, 9) broadcasts as (P, 1)
# ---------------------------------------------------------------------------


def _sampson_tab_block(E9b, tab):
    """Squared Sampson error for a BLOCK of hypotheses per pair.

    E9b (P, HB, 9); tab components (P, cap) -> (P, HB, cap). Pure
    broadcasting — one fused elementwise sweep for all HB hypotheses
    (the per-hypothesis lax.map serialized 64 sweeps per scan round and
    was 84% of the chunk's device time at ~zero HBM/MXU utilization,
    scripts/profile_relpose.py)."""
    e = [E9b[..., k:k + 1] for k in range(9)]  # (P, HB, 1)
    x1, y1, z1, x2, y2, z2 = (c[:, None, :] for c in tab)  # (P, 1, cap)
    iz1 = 1.0 / (z1 + 1e-12)
    iz2 = 1.0 / (z2 + 1e-12)
    a0, a1 = x1 * iz1, y1 * iz1
    b0, b1 = x2 * iz2, y2 * iz2
    Ex0 = e[0] * a0 + e[1] * a1 + e[2]
    Ex1 = e[3] * a0 + e[4] * a1 + e[5]
    Ex2 = e[6] * a0 + e[7] * a1 + e[8]
    Et0 = e[0] * b0 + e[3] * b1 + e[6]
    Et1 = e[1] * b0 + e[4] * b1 + e[7]
    C = Ex0 * b0 + Ex1 * b1 + Ex2
    denom = Ex0 * Ex0 + Ex1 * Ex1 + Et0 * Et0 + Et1 * Et1
    return C * C / jnp.maximum(denom, 1e-12)


def _sampson_tab(E9, tab):
    """Squared Sampson error over pair tables.

    E9 (P, 9); tab = (x1, y1, z1, x2, y2, z2) each (P, cap)."""
    e = [E9[:, k:k + 1] for k in range(9)]
    x1, y1, z1, x2, y2, z2 = tab
    iz1 = 1.0 / (z1 + 1e-12)
    iz2 = 1.0 / (z2 + 1e-12)
    a0, a1 = x1 * iz1, y1 * iz1
    b0, b1 = x2 * iz2, y2 * iz2
    Ex0 = e[0] * a0 + e[1] * a1 + e[2]
    Ex1 = e[3] * a0 + e[4] * a1 + e[5]
    Ex2 = e[6] * a0 + e[7] * a1 + e[8]
    Et0 = e[0] * b0 + e[3] * b1 + e[6]
    Et1 = e[1] * b0 + e[4] * b1 + e[7]
    C = Ex0 * b0 + Ex1 * b1 + Ex2
    denom = Ex0 * Ex0 + Ex1 * Ex1 + Et0 * Et0 + Et1 * Et1
    return C * C / jnp.maximum(denom, 1e-12)


def _cheirality_tab(R9, t3, tab, min_depth=1e-2, max_depth=100.0):
    """PoseLib cheirality over tables; R9 (P, 9), t3 (P, 3)."""
    r = [R9[:, k:k + 1] for k in range(9)]
    t = [t3[:, k:k + 1] for k in range(3)]
    x1, y1, z1, x2, y2, z2 = tab
    Rx0 = r[0] * x1 + r[1] * y1 + r[2] * z1
    Rx1 = r[3] * x1 + r[4] * y1 + r[5] * z1
    Rx2 = r[6] * x1 + r[7] * y1 + r[8] * z1
    a = -(Rx0 * x2 + Rx1 * y2 + Rx2 * z2)
    b1 = -(Rx0 * t[0] + Rx1 * t[1] + Rx2 * t[2])
    b2 = x2 * t[0] + y2 * t[1] + z2 * t[2]
    lam1 = b1 - a * b2
    lam2 = -a * b1 + b2
    scale = 1.0 - a * a
    lo = min_depth * scale
    hi = max_depth * scale
    return (lam1 > lo) & (lam2 > lo) & (lam1 < hi) & (lam2 < hi)


def _cheirality_rows(R9_m, tT_m, x1T, x2T, min_depth=1e-2, max_depth=100.0):
    """check_cheirality in lane-major flat layout (used by pair_inliers):
    R9_m (9, M), tT_m (3, M), rays (3, M)."""
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


def _decompose_E(E):
    """E -> 4 candidate (quat, t), t unit (standard U W V^T recipe)."""
    U, V = sa.essential_basis(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    dtype=E.dtype)
    Vt = jnp.swapaxes(V, -1, -2)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    # keep rotations proper
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))[..., None, None]
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))[..., None, None]
    t = U[..., :, 2]
    qs = jnp.stack([rotm.rotmat_to_quat(R1), rotm.rotmat_to_quat(R1),
                    rotm.rotmat_to_quat(R2), rotm.rotmat_to_quat(R2)],
                   axis=-2)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return qs, ts


# ---------------------------------------------------------------------------
# RANSAC over tables
# ---------------------------------------------------------------------------


def _ransac_rounds(key, tab, mask, counts, sq_thres, init_E, init_cnt,
                   hyp_per_round: int, rounds: int):
    """Core RANSAC scan: `rounds` x `hyp_per_round` fresh 8-point
    hypotheses per pair, folded into the running best.

    tab: 6 x (P, cap) ray components; mask (P, cap); counts (P,)
    distinct-slot spans (min(total, cap); the first `counts[p]`
    slots of pair p hold distinct matches — cyclic fill).
    Returns (best_E (P, 3, 3), best_count (P,))."""
    x1, y1, z1, x2, y2, z2 = tab
    P = x1.shape[0]
    cap = x1.shape[1]
    thr = sq_thres[:, None]
    from glomap_tpu.ops.pallas_kernels import _on_tpu
    on_tpu = _on_tpu()
    tab6 = jnp.stack(tab, axis=1)  # (P, 6, cap), loop-invariant

    def one_round(carry, rkey):
        best_E, best_cnt = carry
        # DISTINCT 8-sample minimal sets via a random arithmetic
        # progression modulo the pair's distinct-slot count: 8
        # independent draws from a small pair (e.g. 30 matches behind
        # the 512 with-replacement slots) collide with ~60% probability
        # and a duplicated correspondence makes the 8-point system
        # degenerate — measured on the 800-image capture, the small-pair
        # tail burned toward the full 50k budget on wasted hypotheses.
        # {b + k*s mod n} is collision-free unless n/gcd(n, s) <= 7
        # (rare for random s; such hypotheses just degenerate as
        # before). The table is filled CYCLICALLY for pairs with
        # total <= cap so slot index == match index (estimate_...).
        u = jax.random.randint(rkey, (P, 2, hyp_per_round), 0,
                               jnp.int32(2 ** 30))
        n = jnp.maximum(counts, 1)[:, None].astype(jnp.int32)  # (P, 1)
        b = u[:, 0] % n
        step = 1 + u[:, 1] % jnp.maximum(n - 1, 1)
        k8 = jnp.arange(8, dtype=jnp.int32)[None, :, None]
        idx = ((b[:, None, :] + k8 * step[:, None, :])
               % n[:, :, None]).reshape(P, 8 * hyp_per_round)

        # samples laid out (P, 8, H): the HYPOTHESIS axis rides the
        # 128-lane minor dim, so every per-(pair, hypothesis) scalar of
        # the nullspace/projection algebra below is a dense (P, H)
        # array. The packed (P, H, 9, 9)-tensor formulation sliced those
        # scalars as (P, H, 1, 1) tiles (T(1,128): one value per lane
        # row, ~1/1000 VPU utilization) and that single fusion was 84%
        # of the chunk's device time (scripts/profile_relpose.py).
        #
        # On TPU the per-pair sample gather itself runs as ONE batched
        # one-hot MXU dot (XLA fuses the iota-compare into the operand):
        # the take_along_axis lane-axis gather it replaces was 95% of
        # the round-4 chunk profile — 400 -> 10 ms per 2048x256 chunk
        # measured (lane gathers run ~5 GB/s, CLAUDE.md).
        if on_tpu:
            oh = (idx[:, :, None] ==
                  jnp.arange(cap, dtype=jnp.int32)[None, None, :]
                  ).astype(x1.dtype)               # (P, S, cap) fused
            smp = jax.lax.dot_general(
                oh, tab6, (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)  # (P, S, 6)
            # HIGHEST: one-hot x f32 under bf16x3 reconstructs the f32
            # sample exactly (default bf16 single-pass rounds the rays
            # to ~3 digits)
            comps = [smp[:, :, k].reshape(P, 8, hyp_per_round)
                     for k in range(6)]
        else:
            def take(c):
                return jnp.take_along_axis(c, idx, axis=1).reshape(
                    P, 8, hyp_per_round)
            comps = [take(c) for c in tab]
        s1 = tuple(comps[0:3])
        s2 = tuple(comps[3:6])
        # epipolar rows kron(x2, x1): A[k, 3i+j] = s2[i] s1[j]
        A_c = [s2[a // 3] * s1[a % 3] for a in range(9)]
        # normal-equation components (P, H): reduce over the 8 samples
        AtA = [[None] * 9 for _ in range(9)]
        for a in range(9):
            for b in range(a, 9):
                AtA[a][b] = AtA[b][a] = jnp.sum(A_c[a] * A_c[b], axis=1)
        e9 = sa.min_eigvec9_c(AtA)                    # 9 x (P, H)
        Ec = sa.essential_project_c(
            [[e9[3 * i + j] for j in range(3)] for i in range(3)])
        E9 = jnp.stack([Ec[i][j] for i in range(3) for j in range(3)],
                       axis=-1)                       # (P, H, 9)

        # block the scoring: HB hypotheses per fused broadcast sweep
        # ((P, HB, cap) intermediates stay ~tens of MB), scanned over
        # the blocks — per-hypothesis lax.map serialized 64 tiny sweeps
        # and dominated the chunk (profile_relpose.py)
        HB = min(8, hyp_per_round)
        nb = hyp_per_round // HB
        E9_blocks = jnp.moveaxis(
            E9.reshape(P, nb, HB, 9), 1, 0)  # (nb, P, HB, 9)

        def score_blk(E9b):
            err = _sampson_tab_block(E9b, tab)  # (P, HB, cap)
            return jnp.sum((err < thr[:, None, :]) & mask[:, None, :],
                           axis=2).astype(jnp.int32)

        cnts_b = jax.lax.map(score_blk, E9_blocks)  # (nb, P, HB)
        cnts = jnp.moveaxis(cnts_b, 0, 1).reshape(P, hyp_per_round).T
        h_best = jnp.argmax(cnts, axis=0)
        cnt_best = jnp.take_along_axis(cnts, h_best[None], axis=0)[0]
        E_best = E9[jnp.arange(P), h_best].reshape(P, 3, 3)
        improve = cnt_best > best_cnt
        best_E = jnp.where(improve[:, None, None], E_best, best_E)
        best_cnt = jnp.where(improve, cnt_best, best_cnt)
        return (best_E, best_cnt), None

    keys = jax.random.split(key, rounds)
    (best_E, best_cnt), _ = jax.lax.scan(one_round, (init_E, init_cnt),
                                         keys)
    return best_E, best_cnt


@partial(jax.jit, static_argnames=("hyp_per_round", "rounds"))
def _ransac_chunk(key, tab, mask, counts, sq_thres, best_E, best_cnt, idx,
                  hyp_per_round: int, rounds: int):
    """One adaptive chunk: fresh hypotheses for the ACTIVE pairs only.

    idx (Pa,): active pair rows, bucket-padded with the value P (one past
    the last pair) — best_E/best_cnt carry an extra dummy row P that
    absorbs the padded scatters, and the (P, cap) table gathers clamp
    out-of-range indices to the last real pair (wasted compute, no
    aliasing). Pa shrinks bucket-by-bucket as pairs reach their adaptive
    confidence target, so easy pairs stop paying for hard ones."""
    sub = tuple(c[idx] for c in tab)
    sE, scnt = _ransac_rounds(key, sub, mask[idx], counts[idx],
                              sq_thres[idx], best_E[idx], best_cnt[idx],
                              hyp_per_round, rounds)
    return best_E.at[idx].set(sE), best_cnt.at[idx].set(scnt)


@jax.jit
def _choose_pose_tab(best_E, tab, mask):
    """Decompose E; cheirality vote over the tables."""
    qs, ts = _decompose_E(best_E)  # (P, 4, 4), (P, 4, 3)

    def votes(k):
        R9 = rotm.quat_to_rotmat(qs[:, k]).reshape(-1, 9)
        ch = _cheirality_tab(R9, ts[:, k], tab) & mask
        return jnp.sum(ch, axis=1).astype(jnp.int32)

    v = jax.lax.map(votes, jnp.arange(4))  # (4, P)
    k_best = jnp.argmax(v, axis=0)
    P = best_E.shape[0]
    q = qs[jnp.arange(P), k_best]
    t = ts[jnp.arange(P), k_best]
    return rotm.quat_normalize(q), t


def _tangent_basis(t):
    """(..., 3) unit vectors -> two orthonormal tangent vectors."""
    a = jnp.where(jnp.abs(t[..., :1]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], t.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(t, b1)
    return b1, b2


@partial(jax.jit, static_argnames=("num_iters",))
def _refine_poses_tab(q0, t0, tab, mask, sq_thres, num_iters: int):
    """Batched LM (LO step) on the pair tables; truncated squared Sampson.

    Jacobians via the per-pair dE9/dz chain rule: dE9/dz is a tiny (9, 5)
    per-pair tensor (jacfwd over pairs); each dr/dz_k is one jvp of the
    table Sampson sweep. Normal equations by trailing-axis reduction."""
    dtype = t0.dtype
    P = t0.shape[0]
    thr = sq_thres[:, None]
    maskf = mask.astype(dtype)

    def E9_of(q, t, b1, b2, z):
        q2 = rotm.quat_mul(q, rotm.so3_exp_quat(z[0:3]))
        t2 = t + z[3] * b1 + z[4] * b2
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
        return tv.essential_from_motion(q2, t2).reshape(9)

    def cost_of(q, t):
        E9 = jax.vmap(lambda qq, tt: tv.essential_from_motion(
            qq, tt).reshape(9))(q, t)
        err = _sampson_tab(E9, tab)
        return jnp.sum(jnp.minimum(err, thr) * maskf, axis=1)

    def lm_step(state, _):
        q, t, lam, cost = state
        b1, b2 = _tangent_basis(t)
        z0 = jnp.zeros((P, 5), dtype)
        E9 = jax.vmap(E9_of)(q, t, b1, b2, z0)  # (P, 9)
        dE9 = jax.vmap(jax.jacfwd(E9_of, argnums=4))(q, t, b1, b2, z0)

        sampson = lambda e: _sampson_tab(e, tab)
        r2 = sampson(E9)
        r = jnp.sqrt(jnp.maximum(r2, 1e-18))
        w = ((r2 < thr) & mask).astype(dtype)

        Jrows = []
        for k in range(5):
            _, dr2 = jax.jvp(sampson, (E9,), (dE9[:, :, k],))
            Jrows.append(dr2 / (2.0 * r))  # (P, cap)
        H = jnp.zeros((P, 5, 5), dtype)
        g = jnp.zeros((P, 5), dtype)
        for a in range(5):
            g = g.at[:, a].set(jnp.sum(w * r * Jrows[a], axis=1))
            for b in range(a, 5):
                hab = jnp.sum(w * Jrows[a] * Jrows[b], axis=1)
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
        t_new = t_new / jnp.maximum(
            jnp.linalg.norm(t_new, axis=-1, keepdims=True), 1e-12)
        new_cost = cost_of(q_new, t_new)
        accept = new_cost < cost
        q = jnp.where(accept[:, None], q_new, q)
        t = jnp.where(accept[:, None], t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e6))
        return (q, t, lam, cost), None

    state = (q0, t0, jnp.full((P,), 1e-3, dtype), cost_of(q0, t0))
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
    if vg.num_pairs == 0 or vg.num_matches == 0:
        return
    # ---- pack a bounded random subsample per pair into (P, cap) tables.
    # Sampling is WITH replacement, directly into the table: O(P x cap)
    # gathers instead of the old O(M log M) fused-key argsort over all
    # 8M matches (~1 s of host prep on the bench scene). Duplicate
    # samples in a pair's table only reweight its score — the inlier
    # RATIO the adaptive stopping rule consumes stays unbiased, and the
    # FULL match set is classified downstream by pair_inliers.
    import logging as _logging
    import time as _time0
    _plog = _logging.getLogger(__name__)
    _tprep = _time0.time()
    rng_np = np.random.default_rng(seed)
    P = vg.num_pairs
    cap = max(int(getattr(opts, "score_match_cap", 512) or 512), 16)
    total = np.diff(vg.pair_match_offset)
    # every table slot of a non-empty pair holds a sample, so the valid
    # slot count (sampling range + stopping-ratio denominator) is cap
    # counts = the DISTINCT-slot span for the progression sampler (the
    # first min(total, cap) slots hold distinct matches); the stopping
    # ratio denominator stays cap (every slot is filled and scored)
    counts = np.where(total > 0, np.minimum(total, cap), 0).astype(
        np.int32)
    ar = np.arange(cap, dtype=np.int64)[None, :]
    sel_cyc = vg.pair_match_offset[:-1, None] + \
        ar % np.maximum(total, 1)[:, None]
    sel_rand = (vg.pair_match_offset[:-1, None] +
                (rng_np.random((P, cap)) *
                 np.maximum(total, 1)[:, None]).astype(np.int64))
    sel = np.where((total <= cap)[:, None], sel_cyc, sel_rand)
    # compact upload: (P, cap) uint16 feature ids + (P,) int32 bases +
    # (P,) valid rows — the old int32 global-index/mask tables were
    # 22.5 MB of BLOCKING jnp.asarray transfer racing the 33 MB
    # feature-id prefetch for tunnel bandwidth; this is ~5 MB, the
    # global indices and the (P, cap) mask are rebuilt on device
    f1s_np = vg.match_f1[sel]
    f2s_np = vg.match_f2[sel]
    fits16 = max(int(f1s_np.max(initial=0)),
                 int(f2s_np.max(initial=0))) < (1 << 16)
    fdt = np.uint16 if fits16 else np.int32
    f1s_np = f1s_np.astype(fdt)
    f2s_np = f2s_np.astype(fdt)
    base1_np = scene.kp_offset[vg.pair_i].astype(np.int32)
    base2_np = scene.kp_offset[vg.pair_j].astype(np.int32)
    maskP_np = vg.pair_valid & (total > 0)

    from glomap_tpu.processors.undistortion import device_keypoints
    kp_rayT, _ = device_keypoints(scene)

    @jax.jit
    def build_tab(kp_rayT, f1s, f2s, base1, base2, maskP):
        # ONE (K, 3) row gather per endpoint instead of three (K,)
        # gathers with identical indices — gather cost is per-index
        # (see pair_inliers._score_matches note); global keypoint
        # indices are rebuilt on device from the compact uint16 tables
        mask = jnp.broadcast_to(maskP[:, None], f1s.shape)
        kp_rows = kp_rayT.T
        comps = []
        for f, base in ((f1s, base1), (f2s, base2)):
            idx = base[:, None] + f.astype(jnp.int32)
            g = kp_rows[idx.reshape(-1)].reshape(*idx.shape, 3)
            for k in range(3):
                c = g[..., k]
                if k == 2:  # padded z stays 1 to avoid div blowups
                    c = jnp.where(mask, c, 1.0)
                comps.append(c.astype(dtype))
        return tuple(comps), mask

    _tsel = _time0.time()
    tab, mask = build_tab(kp_rayT, jnp.asarray(f1s_np),
                          jnp.asarray(f2s_np), jnp.asarray(base1_np),
                          jnp.asarray(base2_np), jnp.asarray(maskP_np))
    counts_d = jnp.asarray(counts)
    _plog.debug("relpose prep: host sel %.2fs, upload+tab dispatch %.2fs",
                _tsel - _tprep, _time0.time() - _tsel)
    # start the inlier sweep's big feature-id upload AFTER the prep
    # tables: the async 33 MB transfer rides under the RANSAC wall, and
    # launching it first starved the small blocking prep uploads on
    # congested tunnel sessions (measured 10.6 s prep vs 0.9 s)
    from glomap_tpu.processors.pair_inliers import prefetch_match_features
    prefetch_match_features(vg)

    # normalized Sampson threshold per pair (same conversion as inlier
    # scoring: px * 0.5 * (1/f1 + 1/f2))
    from glomap_tpu.ops import camera_models as cmod
    f1 = cmod.mean_focal(scene.cam_params[scene.image_camera[vg.pair_i]])
    f2 = cmod.mean_focal(scene.cam_params[scene.image_camera[vg.pair_j]])
    thres = opts.max_epipolar_error * 0.5 * (1.0 / f1 + 1.0 / f2)
    sq_thres = jnp.asarray(thres * thres, dtype=dtype)

    import logging
    import time as _time
    _log = logging.getLogger(__name__)

    # ---- adaptive RANSAC budget (PoseLib LO-RANSAC parity,
    # relpose_estimation.h:14: max_iterations=50000, min_iterations=1000
    # PoseLib default, success probability 0.9999). Hypotheses are spent
    # in fixed 512-hypothesis chunks (8 scan rounds x 64 — ONE compiled
    # graph per active-set bucket); after each chunk every pair's
    # remaining budget is the standard RANSAC stopping number
    # N = log(1-conf)/log(1-r^8) from its best inlier ratio r, and
    # converged pairs leave the active set (bucket-padded host-side
    # compaction), so easy pairs stop after `num_hypotheses` while
    # 60%-inlier pairs run to the reference's full 50k budget.
    hyp_per_round = 64
    chunk_rounds = max(1, min(int(opts.num_hypotheses), 512) //
                       hyp_per_round)
    chunk_hyp = chunk_rounds * hyp_per_round
    min_hyp = max(int(opts.num_hypotheses), chunk_hyp)
    max_hyp = max(int(opts.max_iterations), min_hyp)
    conf = 0.9999

    # The active set is processed in fixed-size tiles through TWO
    # compiled chunk graphs: every distinct active-set shape would be a
    # separate remote compile of the RANSAC scan (~100 s each through
    # the tunnel — 7 shape buckets measured 690 s cold), but a single
    # big tile wastes a full-tile sweep on every tail chunk once only a
    # handful of hard pairs remain (measured 2x on the warm bench). Big
    # tiles carry the opening full-population chunks, the small tile
    # carries the long adaptive tail.
    from glomap_tpu.utils.padding import bucket_size
    TILE_BIG = int(min(bucket_size(min(P, 2048), 64), 2048))
    TILE_SMALL = min(256, TILE_BIG)

    key = jax.random.PRNGKey(seed)
    _t0 = _time.time()
    best_E = jnp.zeros((P + 1, 3, 3), dtype)
    best_cnt = jnp.zeros((P + 1,), jnp.int32)
    # ratio denominator: all cap slots are filled and scored for any
    # non-empty pair (cyclic fill repeats matches; the slot-inlier
    # fraction stays an unbiased estimate of the pair's inlier ratio)
    counts_f = np.where(total > 0, float(cap), 1.0)
    # only pairs that can yield a result enter the hypothesis loop:
    # invalid pairs (all-false mask => inlier count pinned at 0 =>
    # stopping number inf) would otherwise burn the full 50k budget on
    # results that are discarded anyway, and 8-point sampling needs >= 8
    # DISTINCT matches (real DBs mark UNDEFINED/DEGENERATE/WATERMARK
    # pairs invalid at ingestion — io/convert.py)
    eligible = vg.pair_valid & (total >= 8)
    active = np.nonzero(eligible)[0].astype(np.int32)
    done = np.zeros(P, dtype=np.int64)
    n_chunks = 0
    # Each device->host pull of best_cnt is a full tunnel round-trip
    # (~0.1-0.2 s); syncing after EVERY chunk made the sync latency, not
    # the RANSAC compute, the wall-clock. Chunks between syncs run on a
    # stale active set (bounded extra hypotheses, never fewer), so the
    # stopping rule stays exact while dispatches pipeline on-device.
    sync_stride = 1
    chunks_since_sync = 0
    stride_cap = 4
    while len(active):
        # the adaptive tail (few hard pairs, many hypotheses to go) runs
        # DEEPER chunks on the small tile: 4x the scan rounds per
        # dispatch cuts tunnel round-trips 4x for pairs headed to the
        # 50k cap. (A 16x-deep GRAPH was measured WORSE — overshoot —
        # and every distinct depth is a separate ~100 s remote compile,
        # so the tail keeps ONE compiled shape and instead stretches the
        # SYNC stride by the median remaining budget: extra dispatches
        # of the same graph pipeline on-device, only the host pull is a
        # tunnel round-trip.)
        if len(active) <= 2 * TILE_SMALL:
            tile, rounds = TILE_SMALL, chunk_rounds * 4
        else:
            tile, rounds = TILE_BIG, chunk_rounds
        _tp = _time.time()
        for t0 in range(0, len(active), tile):
            sub_ids = active[t0:t0 + tile]
            idx = np.full(tile, P, dtype=np.int32)
            idx[:len(sub_ids)] = sub_ids
            key, sub = jax.random.split(key)
            best_E, best_cnt = _ransac_chunk(
                sub, tab, mask, counts_d, sq_thres, best_E, best_cnt,
                jnp.asarray(idx), hyp_per_round, rounds)
        _disp = _time.time() - _tp
        done[active] += rounds * hyp_per_round
        n_chunks += 1
        chunks_since_sync += 1
        if chunks_since_sync < sync_stride and \
                done[active].min() < max_hyp:
            _log.debug("ransac pass %d: %d active, dispatch %.3fs "
                       "(no sync)", n_chunks, len(active), _disp)
            continue
        chunks_since_sync = 0
        sync_stride = min(sync_stride * 2, stride_cap)
        # per-pair stopping number from the best inlier ratio so far
        _ts = _time.time()
        cnt_np = np.asarray(best_cnt[:P])
        _log.debug("ransac pass %d: %d active, dispatch %.3fs, "
                   "sync pull %.3fs", n_chunks, len(active), _disp,
                   _time.time() - _ts)
        r = np.clip(cnt_np / counts_f, 0.0, 0.9999)
        p_sample = r ** 8
        with np.errstate(divide="ignore"):
            needed = np.where(
                p_sample > 1e-12,
                np.log(max(1.0 - conf, 1e-16)) /
                np.log1p(-np.minimum(p_sample, 0.999999)),
                np.inf)
        target = np.clip(needed, min_hyp, max_hyp)
        active = np.nonzero(eligible & (done < target))[0].astype(np.int32)
        if len(active):
            # chunks-to-go at the tail depth for the median active pair;
            # syncing much more often than that only buys stale pulls
            remaining = np.median(target[active] - done[active])
            stride_cap = int(np.clip(
                np.ceil(remaining / (4.0 * chunk_hyp)), 4, 12))
    best_E = best_E[:P]
    jax.block_until_ready(best_E)
    _t1 = _time.time()
    q, t = _choose_pose_tab(best_E, tab, mask)
    t.block_until_ready()
    _t2 = _time.time()
    q, t = _refine_poses_tab(q, t, tab, mask, sq_thres,
                             opts.refine_num_lm_iters)
    t.block_until_ready()
    _log.info("relpose: ransac %.1fs (%d adaptive chunks x %d hyp; "
              "hypotheses/pair min %d / mean %d / max %d), choose %.1fs, "
              "refine %.1fs", _t1 - _t0, n_chunks, chunk_hyp,
              int(done.min()) if len(done) else 0,
              int(done.mean()) if len(done) else 0,
              int(done.max()) if len(done) else 0,
              _t2 - _t1, _time.time() - _t2)

    # diagnostics: hypotheses actually spent per pair (tests assert the
    # adaptive stopping numbers; ineligible pairs must stay at 0)
    vg._relpose_budget = done.copy()

    vg.pair_quat = np.array(q, dtype=np.float64, copy=True)
    vg.pair_trans = np.array(t, dtype=np.float64, copy=True)
    # E on host: eager device ops through the tunnel pay a remote
    # mini-compile per op (measured ~17 s for this one line on TPU)
    vg.pair_E = np.asarray(tv.essential_from_motion(
        vg.pair_quat, vg.pair_trans), dtype=np.float64)
