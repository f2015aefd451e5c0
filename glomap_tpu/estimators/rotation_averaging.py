"""Global rotation averaging: L1-IRLS over the view graph, TPU-native.

Counterpart of glomap/estimators/global_rotation_averaging.{h,cc}
(RotationEstimator: MST init -> SolveL1Regression -> SolveIRLS with
Geman-McClure weights, tangent-space linearization dR_ij = dR_j - dR_i).

TPU-first re-design instead of the reference's CHOLMOD path:
  * The linearized residual for edge (i, j) is  e_ij + x_i - x_j  with
    e_ij = Log(R_j^T R_ij R_i), so the A-matrix blocks are +-I3 and the
    IRLS normal equations are exactly  (L ⊗ I3) x = rhs  with L the
    weighted graph Laplacian. Each IRLS sweep is therefore 3 parallel
    solves with ONE F x F Laplacian: dense Cholesky on the MXU for
    moderate F, Jacobi-PCG (gather + segment-sum matvec) at scale.
  * The L1 phase runs IRLS with 1/|r| weights (smoothed) — same robust
    objective the reference's ADMM minimizes, expressed as a fixed-point
    iteration that maps to batched dense algebra.
  * The whole phase is one jitted lax.while_loop: residuals, weights,
    Laplacian build, solve, and the quaternion retraction
    q_i <- q_i ⊗ Exp(x_i) are all batched device ops.

Rig handling: edges between images are mapped to frame unknowns by
conjugating the relative rotation with the (known) sensor_from_rig
rotations: R'_ij = S_j^T R_ij S_i constrains R_fj = R'_ij R_fi.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import RotationEstimatorOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.math import tree as treem
from glomap_tpu.ops import linear

# Weight modes (static switch inside the jitted step)
WEIGHT_L1 = 0
WEIGHT_GEMAN_MCCLURE = 1
WEIGHT_HALF_NORM = 2

# Dense-Cholesky ceiling for the RA normal equations. Measured on v5e:
# cho_factor+solve takes 26/26/36/57 ms at 2048/4096/8192/12288 nodes
# (f32, incl. per-call tunnel sync) and the (n, n) factor at 12288 is
# 600 MB of 16 GB HBM — the dense MXU path wins by a wide margin up to
# here (269 vs 7 IRLS iters/s at 2000 frames). Beyond this, Jacobi-PCG.
_DENSE_MAX_NODES = 12288


@partial(jax.jit, static_argnames=("num_frames", "max_iters", "weight_mode",
                                   "use_dense", "min_iters", "src_width",
                                   "dst_width"))
def _irls_phase(quats, fi, fj, q_rel, base_w, edge_valid, fixed,
                num_frames: int, max_iters: int, weight_mode: int,
                sigma_rad: float, conv_thresh: float, use_dense: bool,
                min_iters: int = 1, grav_mask=None, grav_axis=None,
                # city-scale PCG matvec (>_DENSE_MAX_NODES frames): the
                # DOUBLED edge list sorted by source node, so both
                # directions of every Laplacian apply run as the Pallas
                # sorted-window matmul kernels instead of TPU
                # scatter-adds (~1 ms per 100k-row scatter). Host-side:
                # build_sorted_edge_ops. widths 0 = scatter-add fallback.
                e2_src=None, e2_dst=None, e2_orig=None, e2_sign=None,
                src_width: int = 0, dst_width: int = 0):
    """One robust phase (L1 or reweighted-L2). Returns (quats, num_iters).

    grav_mask (F,) in {0,1}: frames with 1 constrain their tangent update
    to the local up axis (gravity-aligned 1-DoF parameterization,
    reference global_rotation_averaging.cc gravity rows; the up axis
    grav_axis (3,) defaults to the reference's e_y convention,
    RotationEstimatorOptions.axis / global_rotation_averaging.h:52).
    Solved with a projected CG instead of the dense Kronecker path.
    """
    dtype = quats.dtype
    valid_w = jnp.where(edge_valid, base_w, 0.0).astype(dtype)
    has_constraint = grav_mask is not None
    use_windowed = (src_width > 0 and dst_width > 0 and
                    e2_src is not None)

    if has_constraint:
        if grav_axis is None:
            grav_axis = jnp.asarray([0.0, 1.0, 0.0], dtype)
        u_ax = grav_axis.astype(dtype)

        def project(x):
            # constrained frames: keep only the up-axis component
            xg = (x @ u_ax)[:, None] * u_ax[None, :]
            return jnp.where(grav_mask[:, None] > 0, xg, x)
    else:
        def project(x):
            return x

    def residuals(q):
        # e_ij = Log(q_j^-1 ⊗ q_rel ⊗ q_i)
        qe = rotm.quat_mul(rotm.quat_conj(q[fj]),
                           rotm.quat_mul(q_rel, q[fi]))
        return rotm.quat_to_angle_axis(qe)

    def weights_from_residual(e):
        enorm = jnp.linalg.norm(e, axis=-1)
        if weight_mode == WEIGHT_L1:
            w = 1.0 / jnp.maximum(enorm, 1e-5)
        elif weight_mode == WEIGHT_GEMAN_MCCLURE:
            s2 = sigma_rad * sigma_rad
            w = (s2 / (enorm * enorm + s2)) ** 2
        else:  # HALF_NORM: IRLS weight for ||.||^(1/2)
            w = jnp.maximum(enorm, 1e-5) ** (-1.5)
        return w * valid_w

    if use_windowed:
        from glomap_tpu.ops.pallas_kernels import (_on_tpu,
                                                   sorted_segment_gather,
                                                   sorted_segment_rowsum)
        interp = not _on_tpu()

        def seg_reduce(vals):  # (k, E2) -> (F, k)
            return sorted_segment_rowsum(vals, e2_src, num_frames,
                                         src_width, interpret=interp)

        def seg_gather(tab):   # (F, k) -> (k, E2)
            return sorted_segment_gather(tab, e2_dst, dst_width,
                                         interpret=interp)

    def edge_sums(vals_i, vals_j):
        """sum over edges into nodes: vals_i lands at fi, vals_j at fj.
        (E, k) inputs -> (F, k)."""
        if use_windowed:
            # doubled-sorted order: row r came from edge e2_orig[r] with
            # direction e2_sign[r] (+1: src=fi, contributes vals_i)
            v = jnp.where((e2_sign > 0)[None, :],
                          vals_i.T[:, e2_orig], vals_j.T[:, e2_orig])
            return seg_reduce(v)
        out = jnp.zeros((num_frames, vals_i.shape[1]), dtype=dtype)
        out = out.at[fi].add(vals_i)
        out = out.at[fj].add(vals_j)
        return out

    def solve_projected_cg(w, rhs, max_iters=300):
        """CG on P L P + (I - P) with the pinned node, in the constrained
        tangent subspace."""
        deg = edge_sums(w[:, None], w[:, None])[:, 0]
        keep = jnp.ones((num_frames,), dtype=w.dtype).at[fixed].set(0.0)
        b = project(rhs * keep[:, None])
        minv = keep / jnp.maximum(deg, 1e-12) + (1.0 - keep)

        if use_windowed:
            w2 = w[e2_orig]

            def lap_mv(x, keep):
                xk = x * keep[:, None]
                # y = deg x - A x, A x via one windowed gather + rowsum
                gx = seg_gather(xk)           # (3, E2) = x[dst rows]
                y = deg[:, None] * xk - seg_reduce(w2 * gx)
                return y * keep[:, None] + x * (1.0 - keep)[:, None]
        else:
            def lap_mv(x, keep):
                return linear.laplacian_matvec(fi, fj, w, deg, x, keep)

        def mv(x):
            y = lap_mv(project(x), keep)
            return project(y) + (x - project(x))

        return linear.cg_generic(mv, b, minv_diag=minv[:, None],
                                 max_iters=max_iters, tol=1e-10)

    def step(q):
        e = residuals(q)
        w = weights_from_residual(e)
        # rhs: edge contributes -w*e at i, +w*e at j
        we = w[:, None] * e
        rhs = edge_sums(-we, we)
        if use_dense and not has_constraint:
            x = linear.solve_laplacian_dense(fi, fj, w, rhs, num_frames,
                                             fixed)
        else:
            x = solve_projected_cg(w, rhs)
        q_new = rotm.quat_normalize(
            rotm.quat_mul(q, rotm.so3_exp_quat(x.astype(dtype))))
        step_size = jnp.sum(jnp.linalg.norm(x, axis=-1)) / (num_frames - 1)
        return q_new, step_size

    def cond(state):
        _, it, last_step = state
        return (it < max_iters) & ((it < min_iters) |
                                   (last_step > conv_thresh))

    def body(state):
        q, it, _ = state
        q_new, s = step(q)
        return (q_new, it + 1, s)

    q, it, _ = jax.lax.while_loop(cond, body,
                                  (quats, 0, jnp.asarray(1e30, dtype)))
    return q, it


@partial(jax.jit, static_argnames=("num_frames", "max_outer"))
def _l1_admm_phase(quats, fi, fj, q_rel, base_w, edge_valid, fixed,
                   num_frames: int, max_outer: int, conv_thresh: float):
    """Exact L1 phase: ADMM on min ||diag(w)(A x - r)||_1 per outer round.

    Counterpart of SolveL1Regression (global_rotation_averaging.cc:479-538)
    + colmap::LeastAbsoluteDeviationSolver: the reference caches ONE
    CHOLMOD factorization of A^T A for the whole phase and runs Boyd-style
    ADMM (x-solve, elementwise shrinkage, dual ascent) with an inner
    iteration cap that doubles 10 -> 100 across outer rounds. Here
    A^T A = Laplacian(w^2) (x) I3, so the cached factor is ONE dense
    Cholesky of the pinned F x F Laplacian on the MXU; every inner
    iteration is a triangular solve with 3 rhs columns plus O(E)
    gather/segment-sum — all inside one jitted while_loop. Returns
    (quats, outer_iters).
    """
    dtype = quats.dtype
    w = jnp.where(edge_valid, base_w, 0.0).astype(dtype)
    rho, alpha = 1.0, 1.0  # colmap LeastAbsoluteDeviationSolver defaults
    abs_tol, rel_tol = 1e-4, 1e-2
    num_rows = 3.0 * len(w)
    num_cols = 3.0 * num_frames

    keep = jnp.ones((num_frames,), dtype=dtype).at[fixed].set(0.0)
    L = linear.build_laplacian_dense(fi, fj, w * w, num_frames)
    scale = jnp.maximum(jnp.mean(jnp.diag(L)), 1.0)
    L = L + (1e-10 * scale) * jnp.eye(num_frames, dtype=dtype)
    L, _ = linear.pin_node(L, jnp.zeros((num_frames, 1), dtype), fixed)
    cfac = jax.scipy.linalg.cho_factor(L)

    def At(v):  # (E,3) -> (F,3); fixed row zeroed (gauge)
        out = jnp.zeros((num_frames, 3), dtype)
        out = out.at[fi].add(w[:, None] * v)
        out = out.at[fj].add(-w[:, None] * v)
        return out * keep[:, None]

    def Ax(x):
        xk = x * keep[:, None]
        return w[:, None] * (xk[fi] - xk[fj])

    def residuals(q):
        qe = rotm.quat_mul(rotm.quat_conj(q[fj]),
                           rotm.quat_mul(q_rel, q[fi]))
        return rotm.quat_to_angle_axis(qe)

    def shrink(v, kappa):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)

    def admm(b, inner_cap):
        bnorm = jnp.linalg.norm(b)

        def cond(st):
            x, z, u, z_old, it = st
            pri = jnp.linalg.norm(Ax(x) - z - b)
            dua = jnp.linalg.norm(rho * At(z - z_old))
            eps_pri = (jnp.sqrt(num_rows) * abs_tol + rel_tol *
                       jnp.maximum(jnp.maximum(jnp.linalg.norm(Ax(x)),
                                               jnp.linalg.norm(z)), bnorm))
            eps_dua = (jnp.sqrt(num_cols) * abs_tol +
                       rel_tol * jnp.linalg.norm(rho * At(u)))
            done = (it > 0) & (pri <= eps_pri) & (dua <= eps_dua)
            return (it < inner_cap) & ~done

        def body(st):
            x, z, u, _, it = st
            x = jax.scipy.linalg.cho_solve(cfac, At(b + z - u))
            ax = alpha * Ax(x) + (1.0 - alpha) * (z + b)
            z_new = shrink(ax - b + u, 1.0 / rho)
            u = u + ax - b - z_new
            return (x, z_new, u, z, it + 1)

        z0 = jnp.zeros_like(b)
        x0 = jnp.zeros((num_frames, 3), dtype)
        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x0, z0, z0, z0, jnp.asarray(0)))
        return x

    def outer_body(state):
        q, it, _, inner_cap, last_norm = state
        e = residuals(q)
        # rows: w (e + x_i - x_j)  =>  b = -w e
        x = admm(-w[:, None] * e, inner_cap)
        q_new = rotm.quat_normalize(
            rotm.quat_mul(q, rotm.so3_exp_quat(x.astype(dtype))))
        step = jnp.sum(jnp.linalg.norm(x, axis=-1)) / (num_frames - 1)
        cur_norm = jnp.linalg.norm(x)
        # the reference stalls out when the step norm stops changing
        stalled = jnp.abs(cur_norm - last_norm) < 1e-12
        step = jnp.where(stalled, 0.0, step)
        return (q_new, it + 1, step,
                jnp.minimum(inner_cap * 2, 100), cur_norm)

    def outer_cond(state):
        _, it, last_step, _, _ = state
        return (it < max_outer) & (last_step > conv_thresh)

    q, it, _, _, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (quats, 0, jnp.asarray(jnp.inf, dtype), jnp.asarray(10),
         jnp.asarray(jnp.inf, dtype)))
    return q, it


@partial(jax.jit, static_argnames=("num_frames",))
def _dense_factor_relerr(fi, fj, base_w, edge_valid, num_frames: int,
                         fixed):
    """Health probe of the dense Cholesky factor the ADMM phase caches:
    factor the pinned Laplacian, solve L x = L v for a known v, return
    the relative error. O(F^2)+one factor — cheap next to the phase."""
    dtype = base_w.dtype
    w = jnp.where(edge_valid, base_w, 0.0)
    L = linear.build_laplacian_dense(fi, fj, w * w, num_frames)
    scale = jnp.maximum(jnp.mean(jnp.diag(L)), 1.0)
    L = L + (1e-10 * scale) * jnp.eye(num_frames, dtype=dtype)
    L, _ = linear.pin_node(L, jnp.zeros((num_frames, 1), dtype), fixed)
    cfac = jax.scipy.linalg.cho_factor(L)
    # probe with the SMOOTH mode (normalized linear ramp): on path-like
    # capture graphs the near-nullspace of L is low-frequency, which is
    # exactly where a half-precision factor loses everything — a
    # high-frequency probe would report health on a useless factor
    ar = jnp.arange(num_frames, dtype=dtype)
    v = ((ar - jnp.mean(ar)) / num_frames)[:, None]
    x = jax.scipy.linalg.cho_solve(cfac, L @ v)
    return jnp.linalg.norm(x - v) / jnp.maximum(jnp.linalg.norm(v), 1e-30)


@partial(jax.jit, static_argnames=())
def _l1_objective(quats, fi, fj, q_rel, base_w, edge_valid):
    """Sum of weighted residual angles — the L1 phase's objective."""
    w = jnp.where(edge_valid, base_w, 0.0)
    qe = rotm.quat_mul(rotm.quat_conj(quats[fj]),
                       rotm.quat_mul(q_rel, quats[fi]))
    e = rotm.quat_to_angle_axis(qe)
    return jnp.sum(w * jnp.linalg.norm(e, axis=-1))


def l1_phase_guarded(quats, fi, fj, q_rel, base_w, valid, root,
                     num_frames: int, opts, sigma_rad: float,
                     use_dense: bool, grav_mask=None, grav_axis=None,
                     sorted_ops=None,
                     fallback_dense: bool | None = None):
    """L1 phase: the EXACT reference ADMM where eligible, followed by an
    L1-IRLS safety net, keeping the better L1 objective.

    Why the net: the reference's cached-factor Boyd ADMM applies full
    linearized steps for at most max_num_l1_iterations outer rounds — on
    long path-like graphs with a poor MST init the linearization is
    invalid and the phase diverges to garbage while still "decreasing"
    the objective from an astronomical start (measured: 180 deg errors
    at 10k frames in BOTH f32 and f64, i.e. the algorithm, not
    precision). The L1-IRLS fixed point with per-sweep reweighting is
    self-correcting on the same objective, so it runs afterwards and the
    better of the two states wins; when the ADMM succeeded (the
    reference's tested regime) the IRLS pass starts at the optimum and
    exits after its minimum sweeps with the ADMM result intact."""
    import logging
    log = logging.getLogger(__name__)
    sorted_ops = sorted_ops or {}
    if use_dense and grav_mask is None:
        # factor-health probe on the smooth mode (skips the phase when a
        # half-precision factor of an ill-conditioned capture graph would
        # make every inner solve useless)
        relerr = float(_dense_factor_relerr(fi, fj, base_w, valid,
                                            num_frames, root))
        if relerr < 1e-2:
            q_try, _ = _l1_admm_phase(
                quats, fi, fj, q_rel, base_w, valid, root, num_frames,
                max_outer=opts.max_num_l1_iterations,
                conv_thresh=opts.l1_step_convergence_threshold)
            before = float(_l1_objective(quats, fi, fj, q_rel, base_w,
                                         valid))
            after = float(_l1_objective(q_try, fi, fj, q_rel, base_w,
                                        valid))
            if np.isfinite(after) and after <= before:
                quats = q_try
            else:
                log.warning(
                    "L1 ADMM phase did not decrease the objective "
                    "(%.3e -> %.3e) — discarding its result", before,
                    after)
        else:
            log.warning(
                "dense Laplacian factor relative error %.2e in %s — "
                "skipping the ADMM L1 phase", relerr, str(quats.dtype))
    if fallback_dense is None:
        fallback_dense = use_dense and grav_mask is None
    q_irls, _ = _irls_phase(
        quats, fi, fj, q_rel, base_w, valid, root, num_frames,
        max_iters=max(10 * opts.max_num_l1_iterations, 50),
        weight_mode=WEIGHT_L1, sigma_rad=sigma_rad,
        conv_thresh=0.1 * opts.l1_step_convergence_threshold,
        use_dense=fallback_dense, min_iters=10,
        grav_mask=grav_mask, grav_axis=grav_axis, **sorted_ops)
    obj_cur = float(_l1_objective(quats, fi, fj, q_rel, base_w, valid))
    obj_irls = float(_l1_objective(q_irls, fi, fj, q_rel, base_w, valid))
    if np.isfinite(obj_irls) and obj_irls <= obj_cur:
        return q_irls
    return quats


def build_sorted_edge_ops(fi: np.ndarray, fj: np.ndarray,
                          cap: int = 4096):
    """Host-side prep for the windowed PCG matvec: the doubled edge list
    (both directions) sorted by source node, with the static per-block
    id-window bounds of both the source (reduce) and destination
    (gather) axes. Returns None when the graph lacks locality (widths
    above `cap`) — callers then keep the scatter-add fallback."""
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    E = len(fi)
    if E == 0:
        return None
    src = np.concatenate([fi, fj]).astype(np.int32)
    dst = np.concatenate([fj, fi]).astype(np.int32)
    orig = np.concatenate([np.arange(E), np.arange(E)]).astype(np.int32)
    sign = np.concatenate([np.ones(E, np.int8), -np.ones(E, np.int8)])
    perm = np.argsort(src, kind="stable")
    src, dst, orig, sign = src[perm], dst[perm], orig[perm], sign[perm]
    sw = block_width_for_sorted(src)
    dw = block_width_for_sorted(dst)
    if sw > cap or dw > cap:
        return None
    return dict(e2_src=src, e2_dst=dst, e2_orig=orig, e2_sign=sign,
                src_width=sw, dst_width=dw)


def _init_from_mst(num_frames, fi, fj, q_rel, weights):
    """Compose relative rotations along the max spanning tree (host).

    Counterpart of InitializeFromMaximumSpanningTree
    (global_rotation_averaging.cc:87), with inlier counts as weights.

    Fully vectorized (city-scale edge counts): the best edge per frame
    pair comes from one lexsort, and the root-to-node composition runs by
    pointer doubling — O(F log depth) batched quaternion products instead
    of an O(F) sequential Python walk.
    """
    parent, order, root = treem.maximum_spanning_tree(
        num_frames, fi, fj, weights)
    fi = np.asarray(fi, dtype=np.int64)
    fj = np.asarray(fj, dtype=np.int64)
    q_rel_np = np.asarray(q_rel)

    # best (max-weight) edge per unordered frame pair, via lexsort
    lo = np.minimum(fi, fj)
    hi = np.maximum(fi, fj)
    key = lo * num_frames + hi
    srt = np.lexsort((weights, key))
    keys_sorted = key[srt]
    is_last = np.ones(len(srt), dtype=bool)
    if len(srt) > 1:
        is_last[:-1] = keys_sorted[1:] != keys_sorted[:-1]
    uniq_keys = keys_sorted[is_last]
    uniq_k = srt[is_last]

    # per-node edge rotation: R_v = q_edge[v] (x) R_parent[v]
    q_edge = np.zeros((num_frames, 4))
    q_edge[:, 0] = 1.0
    has_par = parent >= 0
    v_all = np.nonzero(has_par)[0]
    u_all = parent[v_all]
    tkey = np.minimum(u_all, v_all) * num_frames + np.maximum(u_all, v_all)
    pos = np.searchsorted(uniq_keys, tkey)
    pos = np.clip(pos, 0, max(len(uniq_keys) - 1, 0))
    hit = uniq_keys[pos] == tkey if len(uniq_keys) else \
        np.zeros(len(tkey), dtype=bool)
    k = uniq_k[pos[hit]]
    v_hit = v_all[hit]
    u_hit = u_all[hit]
    forward = fi[k] == u_hit  # R_v = R_rel R_u
    qk = q_rel_np[k].copy()
    qk[~forward] = rotm.quat_conj(qk[~forward])  # R_v = R_rel^-1 R_u
    q_edge[v_hit] = qk

    # pointer doubling: R_v = q_acc[v] (x) R_jump[v]; roots self-loop
    jump = parent.copy()
    is_root = parent < 0
    jump[is_root] = np.nonzero(is_root)[0]
    q_acc = q_edge.copy()
    q_acc[is_root, :] = 0.0
    q_acc[is_root, 0] = 1.0
    while True:
        nxt = jump[jump]
        if np.array_equal(nxt, jump):
            break
        q_acc = np.asarray(rotm.quat_mul(q_acc, q_acc[jump]))
        jump = nxt
    return q_acc, root


def build_frame_edges(scene, view_graph, pair_mask=None):
    """Image-pair edges -> frame edges with sensor-conjugated rotations.

    Returns (fi, fj, q_rel, weight) numpy arrays; intra-frame pairs and
    invalid pairs are dropped. pair_mask optionally restricts to a
    subgraph (used by the stratified gravity solve).
    """
    vg = view_graph
    mask = vg.pair_valid.copy()
    if pair_mask is not None:
        mask &= pair_mask
    im_i, im_j = vg.pair_i, vg.pair_j
    f_i = scene.image_frame[im_i]
    f_j = scene.image_frame[im_j]
    mask &= f_i != f_j
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros((0, 4)), np.zeros(0))
    s_i = scene.image_sensor[im_i[idx]]
    s_j = scene.image_sensor[im_j[idx]]
    q_pair = vg.pair_quat[idx]
    q_si = scene.sensor_quat[s_i]
    q_sj = scene.sensor_quat[s_j]
    q_eff = rotm.quat_mul(rotm.quat_conj(q_sj),
                          rotm.quat_mul(q_pair, q_si))
    w = vg.pair_weight[idx].copy()
    if not w.any():
        w = vg.pair_num_inliers[idx].astype(np.float64)
    return (f_i[idx].astype(np.int32), f_j[idx].astype(np.int32),
            np.asarray(q_eff), w)


def estimate_rotations(scene, view_graph,
                       opts: RotationEstimatorOptions | None = None,
                       dtype=jnp.float64, pair_mask=None) -> bool:
    """Estimate scene.frame_quat from the view graph's relative rotations.

    Counterpart of RotationEstimator::EstimateRotations
    (global_rotation_averaging.cc:40): MST init, L1 phase, IRLS phase.
    With opts.use_gravity, frames carrying gravity priors are constrained
    to the 1-DoF gravity-aligned manifold R = R_align(g) R_up(theta)
    (projected-CG solves; constraint preserved exactly by the e_y tangent
    retraction).
    """
    opts = opts or RotationEstimatorOptions()
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    fi, fj, q_rel, w_edge = build_frame_edges(scene, view_graph, pair_mask)
    num_frames = scene.num_frames
    if len(fi) == 0 or num_frames == 0:
        return False

    base_w = w_edge if opts.use_weight else np.ones_like(w_edge)

    use_gravity = opts.use_gravity and scene.frame_has_gravity.any()

    if opts.skip_initialization:
        quats0 = scene.frame_quat.copy()
        # fixed frame: highest-degree registered frame
        deg = np.bincount(fi, minlength=num_frames) + \
            np.bincount(fj, minlength=num_frames)
        root = int(np.argmax(deg))
    else:
        quats0, root = _init_from_mst(num_frames, fi, fj, q_rel, w_edge)

    grav_mask_d = None
    grav_axis_d = None
    if use_gravity:
        from glomap_tpu.math import gravity as gravm
        axis_u = np.asarray(opts.axis, dtype=np.float64)
        axis_u = axis_u / np.linalg.norm(axis_u)
        g_idx = np.nonzero(scene.frame_has_gravity)[0]
        R_align = gravm.align_rot(scene.frame_gravity[g_idx], axis=axis_u)
        if R_align.ndim == 2:
            R_align = R_align[None]
        # snap init onto the gravity manifold: R = R_align R_up(theta*)
        R0 = rotm.quat_to_rotmat(quats0[g_idx])
        theta = gravm.closest_up_angle(R_align, R0, axis=axis_u)
        R_snap = R_align @ gravm.angle_to_rot_up(theta, axis=axis_u)
        quats0 = quats0.copy()
        quats0[g_idx] = rotm.rotmat_to_quat(R_snap)
        gm = np.zeros(num_frames)
        gm[g_idx] = 1.0
        grav_mask_d = jnp.asarray(gm, dtype=dtype)
        grav_axis_d = jnp.asarray(axis_u, dtype=dtype)

    # bucket-pad the edge axis so the two RA passes (and re-runs after
    # rotation filtering) reuse the compiled solver; padded edges have
    # valid=False -> zero weight
    from glomap_tpu.utils.padding import bucket_size, pad_axis0
    n_edge = len(fi)
    n_pad = bucket_size(n_edge, 128)
    valid = pad_axis0(np.ones(n_edge, dtype=bool), n_pad, fill=False)
    fi_p = pad_axis0(fi, n_pad)
    fj_p = pad_axis0(fj, n_pad)
    q_rel_p = pad_axis0(np.asarray(q_rel), n_pad).copy()
    q_rel_p[n_edge:, 0] = 1.0
    base_w_p = pad_axis0(base_w, n_pad)

    quats = jnp.asarray(quats0, dtype=dtype)
    fi_d = jnp.asarray(fi_p)
    fj_d = jnp.asarray(fj_p)
    q_rel_d = jnp.asarray(q_rel_p, dtype=dtype)
    base_w_d = jnp.asarray(base_w_p, dtype=dtype)
    valid_d = jnp.asarray(valid)
    use_dense = num_frames <= _DENSE_MAX_NODES

    # PCG matvec prep for graphs on the CG path (beyond-dense frame
    # counts or gravity-constrained): windowed kernels replace the
    # scatter-add Laplacian apply when the graph has capture locality
    sorted_ops = {}
    if not use_dense or grav_mask_d is not None:
        ops = build_sorted_edge_ops(fi_p, fj_p)
        if ops is not None:
            sorted_ops = dict(
                e2_src=jnp.asarray(ops["e2_src"]),
                e2_dst=jnp.asarray(ops["e2_dst"]),
                e2_orig=jnp.asarray(ops["e2_orig"]),
                e2_sign=jnp.asarray(ops["e2_sign"]),
                src_width=ops["src_width"], dst_width=ops["dst_width"])

    sigma_rad = float(np.deg2rad(opts.irls_loss_parameter_sigma))
    weight_mode = (WEIGHT_GEMAN_MCCLURE
                   if opts.weight_type == "GEMAN_MCCLURE" else
                   WEIGHT_HALF_NORM)

    # Phase 1 — L1 (robust against outlier edges). On the dense
    # unconstrained path this is the reference's exact algorithm: Boyd
    # ADMM against one cached Cholesky factor per phase
    # (global_rotation_averaging.cc:479-538), guarded by an
    # objective-decrease check (see l1_phase_guarded — f32 conditioning).
    # Gravity-constrained or beyond-dense graphs use L1-IRLS sweeps
    # (same objective as a fixed-point iteration; projected-CG solves),
    # with a minimum-iteration floor and a tighter per-sweep step
    # threshold (L1-IRLS steps can be transiently tiny far from the
    # optimum when outlier subtrees conflict).
    quats = l1_phase_guarded(quats, fi_d, fj_d, q_rel_d, base_w_d,
                             valid_d, root, num_frames, opts, sigma_rad,
                             use_dense, grav_mask=grav_mask_d,
                             grav_axis=grav_axis_d,
                             sorted_ops=sorted_ops)

    # Phase 2 — reweighted least squares (Geman-McClure / half-norm).
    quats, _ = _irls_phase(
        quats, fi_d, fj_d, q_rel_d, base_w_d, valid_d, root, num_frames,
        max_iters=opts.max_num_irls_iterations, weight_mode=weight_mode,
        sigma_rad=sigma_rad,
        conv_thresh=opts.irls_step_convergence_threshold,
        use_dense=use_dense, grav_mask=grav_mask_d,
        grav_axis=grav_axis_d, **sorted_ops)

    q_final = np.asarray(rotm.quat_normalize(quats), dtype=np.float64)
    if not np.all(np.isfinite(q_final)):
        return False
    scene.frame_quat[:] = q_final
    return True
