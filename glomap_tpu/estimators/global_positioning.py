"""Global positioning: BATA-style translation + point estimation, TPU-native.

Counterpart of glomap/estimators/global_positioning.{h,cc}
(GlobalPositioner): unknowns are frame centers, 3D points and one scale
per residual; residual  t_obs - s * (X - c [+ u_rig]); Huber loss (0.1);
random init in [-100, 100]^3; Ceres SPARSE_SCHUR with scales->group 0,
points->group 1, positions->group 2 (global_positioning.cc:28-93,377-430).

TPU-first re-design instead of Ceres:
  * Scales are VARIABLE-PROJECTED: the optimal per-residual scale has the
    closed form s* = <t, d>/<d, d> (the same expression the reference uses
    to initialize scales, global_positioning.cc:300-305), so each LM
    iteration eliminates all O(observations) scale unknowns exactly — the
    reference's Schur "group 0" for free.
  * With s fixed per iteration, the Jacobian blocks are +-s*I3, so the GN
    normal equations form a bipartite (frames x points) graph Laplacian
    whose POINT block is diagonal. Points are Schur-eliminated exactly,
    and the reduced F x F camera system is solved matrix-free with
    Jacobi-preconditioned CG whose matvec is two segment-sums over the
    observation arrays — O(obs) HBM traffic, shards over observations
    with psum.
  * Robust loss = Huber IRLS weights; uncalibrated cameras down-weighted
    by 0.5 (reference loss_function_ptcam_uncalibrated_).
  * The LM loop (cost evaluation, reweighting, Schur solve, accept/reject
    damping) is one jitted lax.while_loop.

Rig handling (known sensor_from_rig): residual uses d = X - c_f + u with
u = R_cam^T t_sensor_from_rig, constant during GP since rotations are
fixed (reference RigBATAPairwiseDirectionError with rig scale pinned at 1).
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import GlobalPositionerOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.ops.linear import cg_generic
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)

# segmentation model (see _gp_segment_iters)
_SEGMENT_TARGET_S = 20.0
_GP_OBS_ITERS_PER_S = 1.6e6


def _huber_weight(r2, delta):
    """IRLS weight of Ceres HuberLoss(delta) on squared norm r2."""
    return jnp.where(r2 <= delta * delta, 1.0,
                     delta / jnp.sqrt(jnp.maximum(r2, 1e-30)))


def _huber_cost(r2, delta):
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2, 2.0 * delta * jnp.sqrt(
        jnp.maximum(r2, 1e-30)) - d2)


def _blocks_from_moments(m, eye3):
    """(n, 7) reduced moments [a, a hx hx, a hx hy, a hx hz, a hy hy,
    a hy hz, a hz hz] -> (n, 3, 3) blocks  sum a (I - h h^T)."""
    A = m[:, 0]
    M = jnp.stack([
        jnp.stack([m[:, 1], m[:, 2], m[:, 3]], -1),
        jnp.stack([m[:, 2], m[:, 4], m[:, 5]], -1),
        jnp.stack([m[:, 3], m[:, 5], m[:, 6]], -1),
    ], axis=-2)
    return A[:, None, None] * eye3 - M


@partial(jax.jit, static_argnames=("num_frames", "num_points", "max_iters",
                                   "cg_iters", "cg_tol", "point_width",
                                   "mesh_axis"))
def _solve_gp(c0, X0,
              # point-to-camera observations; per-obs data is LANE-MAJOR
              # (rows, O) — (O, 3) arrays tile-pad ~42x on TPU
              obs_frame, obs_point, t_obsT, u_rigT, obs_w,
              # camera-to-camera edges (may be empty)
              cc_i, cc_j, t_ccT, cc_w,
              num_frames: int, num_points: int,
              huber_delta: float, function_tol: float,
              max_iters: int, cg_iters: int,
              # inexact-Newton forcing tolerance of the inner Jacobi-PCG
              # on the frame system (same treatment as BA's cg_tol: the
              # LM outer loop absorbs the linear-solve error, and early
              # exit cuts ~10x off the 100-iteration fixed CG chain)
              cg_tol: float = 1e-2,
              point_width: int = 0,
              # partition-aware SPMD (parallel/partitioned_gp): inside
              # shard_map, obs+points are sharded by part, frame centers
              # replicated; frame-axis reductions psum over this axis,
              # point-axis reductions stay local (obs co-located with
              # their point's shard)
              mesh_axis: str | None = None,
              # LM damping carry for host-segmented solves (the tunneled
              # chip KILLS single XLA executions running longer than
              # ~60-90 s — measured: 100 LM iters at 2.4M obs crashed
              # the worker, 40 survived; see solve_global_positioning's
              # segment loop). None = fresh 1e-4.
              lam0=None):
    """LM with exact scale projection + point Schur elimination.

    Lane-major re-design (same treatment that took BA from 8.5 to >100
    LM iters/s): per-obs quantities are (k, O) row stacks, the frame
    axis reduces/gathers through one-hot MXU matmuls, the (sorted) point
    axis through the Pallas sorted-window kernels, and the 3x3
    projection blocks a_o (I - h h^T) are never materialized per
    observation — applying one to a row stack is h(h·u) arithmetic, and
    the per-frame/per-point Hessian blocks assemble from 7 reduced
    moment rows.

    Returns (centers, points, final_cost, iters).
    """
    dtype = c0.dtype
    num_obs = obs_frame.shape[0]
    num_cc = cc_i.shape[0]
    eye3 = jnp.eye(3, dtype=dtype)

    from glomap_tpu.ops.segment_ops import make_axis_ops
    reduce_f, gather_f = make_axis_ops(obs_frame, num_frames, num_obs,
                                       dtype, psum_axis=mesh_axis)
    reduce_p, gather_p = make_axis_ops(obs_point, num_points, num_obs,
                                       dtype, sorted_width=point_width)
    if num_cc:
        reduce_ci, gather_ci = make_axis_ops(cc_i, num_frames, num_cc,
                                             dtype, psum_axis=mesh_axis)
        reduce_cj, gather_cj = make_axis_ops(cc_j, num_frames, num_cc,
                                             dtype, psum_axis=mesh_axis)

    def psum_scalar(x):
        return jax.lax.psum(x, mesh_axis) if mesh_axis is not None else x

    def rows_obs(c, X):
        """Per-obs direction/scale/residual rows from parameters."""
        dT = gather_p(X) - gather_f(c) + u_rigT      # (3, O)
        dn2 = jnp.maximum(jnp.sum(dT * dT, 0), 1e-12)
        s = jnp.maximum(jnp.sum(t_obsT * dT, 0) / dn2, 1e-5)
        rT = t_obsT - s * dT
        return dT, dn2, s, rT

    def rows_cc(c):
        dT = gather_cj(c) - gather_ci(c)
        dn2 = jnp.maximum(jnp.sum(dT * dT, 0), 1e-12)
        s = jnp.maximum(jnp.sum(t_ccT * dT, 0) / dn2, 1e-5)
        rT = t_ccT - s * dT
        return dT, dn2, s, rT

    def cost_of(c, X):
        _, _, s, rT = rows_obs(c, X)
        cost = jnp.sum(obs_w * _huber_cost(jnp.sum(rT * rT, 0),
                                           huber_delta))
        if num_cc:
            _, _, sc, rcT = rows_cc(c)
            cost = cost + jnp.sum(cc_w * _huber_cost(
                jnp.sum(rcT * rcT, 0), huber_delta))
        return psum_scalar(cost)

    def moments(a, hT):
        """(7, O) rows for the block assembly."""
        return jnp.stack([a,
                          a * hT[0] * hT[0], a * hT[0] * hT[1],
                          a * hT[0] * hT[2], a * hT[1] * hT[1],
                          a * hT[1] * hT[2], a * hT[2] * hT[2]])

    def lm_step(state):
        c, X, lam, cost, it, done, _, n_rej = state
        # EXACT scale elimination (Golub-Pereyra): eliminating the
        # per-residual scale s (J_s = -d) turns every +-sI3 Jacobian
        # block into a_o P_o with a_o = w s^2 and P_o = I - h h^T (the
        # projection orthogonal to the observation baseline). The
        # gradient is unchanged because dL/ds = 0 at the projected scale.
        dT, dn2, s, rT = rows_obs(c, X)
        w = obs_w * _huber_weight(jnp.sum(rT * rT, 0), huber_delta)
        hT = dT / jnp.sqrt(dn2)
        a = w * s * s

        def apply_aP(uT):
            """a (I - h h^T) u on row stacks (3, O)."""
            return a * (uT - hT * jnp.sum(hT * uT, 0))

        # exact=True: these sums ARE the gradient and Hessian blocks;
        # default bf16 contraction floors LM at the bf16 roundoff
        # (measured: cost 17 vs 6e-6 at extent-50 scenes, round 5)
        g_c = reduce_f((w * s) * rT, exact=True)      # (F, 3)
        g_X = reduce_p(-(w * s) * rT, exact=True)     # (T, 3)
        m_f = reduce_f(moments(a, hT), exact=True)    # (F, 7)
        m_p = reduce_p(moments(a, hT), exact=True)    # (T, 7)

        if num_cc:
            dcT, dcn2, sc, rcT = rows_cc(c)
            wc = cc_w * _huber_weight(jnp.sum(rcT * rcT, 0), huber_delta)
            hcT = dcT / jnp.sqrt(dcn2)
            acc = wc * sc * sc

            def apply_aPc(uT):
                return acc * (uT - hcT * jnp.sum(hcT * uT, 0))

            # residual t - s(c_j - c_i): dr/dc_i = +sI, dr/dc_j = -sI
            g_c = g_c + reduce_ci((wc * sc) * rcT, exact=True) \
                - reduce_cj((wc * sc) * rcT, exact=True)
            mc = moments(acc, hcT)
            m_f = m_f + reduce_ci(mc, exact=True) \
                + reduce_cj(mc, exact=True)

        B_f = _blocks_from_moments(m_f, eye3)
        B_p = _blocks_from_moments(m_p, eye3)

        def damp(B):
            diag = jnp.diagonal(B, axis1=-2, axis2=-1)
            tr = jnp.maximum(jnp.sum(diag, -1), 1e-10)
            return B + (lam * tr / 3.0 + 1e-12 * tr)[:, None, None] * eye3

        B_f_d = damp(B_f)
        B_p_d = damp(B_p)
        from glomap_tpu.ops.linear import inv3x3
        Bp_inv = inv3x3(B_p_d)

        # rhs of the Schur system on frames: b_f = -g_c - H_cp Bp_inv (-g_X)
        z = jnp.einsum("tij,tj->ti", Bp_inv, -g_X)
        b_f = -g_c - reduce_f(-apply_aP(gather_p(z)), exact=True)

        def schur_mv(v):
            # exact=False: bf16 one-hot expansion inside the CG loop —
            # the forcing-tolerance outer loop absorbs operator rounding
            # (see bundle_adjustment J_apply)
            out = jnp.einsum("fij,fj->fi", B_f_d, v)
            if num_cc:
                out = out + reduce_ci(-apply_aPc(gather_cj(v,
                                                           exact=False))) \
                    + reduce_cj(-apply_aPc(gather_ci(v, exact=False)))
            Hpcv = reduce_p(-apply_aP(gather_f(v, exact=False)))
            z2 = jnp.einsum("tij,tj->ti", Bp_inv, Hpcv)
            return out - reduce_f(-apply_aP(gather_p(z2, exact=False)))

        # block-Jacobi preconditioner from the damped frame blocks
        Bf_inv = inv3x3(B_f_d)
        precond = lambda rr: jnp.einsum("fij,fj->fi", Bf_inv, rr)

        dc_step = cg_generic(schur_mv, b_f, max_iters=cg_iters,
                             tol=cg_tol, precond=precond)
        # back-substitute points: dX = Bp_inv (-g_X - H_pc dc)
        Hpcdc = reduce_p(-apply_aP(gather_f(dc_step)), exact=True)
        dX = jnp.einsum("tij,tj->ti", Bp_inv, -g_X - Hpcdc)

        c_new = c + dc_step
        X_new = X + dX
        new_cost = cost_of(c_new, X_new)
        accept = new_cost < cost
        c = jnp.where(accept, c_new, c)
        X = jnp.where(accept, X_new, X)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        # consecutive-rejection exit: the analog of Ceres's minimum
        # trust-region radius (see bundle_adjustment lm_step) — a
        # stalled solve must not spin to max_iters
        n_rej = jnp.where(accept, 0, n_rej + 1)
        done = (accept & (rel_decrease < function_tol)) | (n_rej >= 8)
        cost = jnp.where(accept, new_cost, cost)
        return (c, X, lam, cost, it + 1, done, accept, n_rej)

    def cond(state):
        it, done = state[4], state[5]
        return (it < max_iters) & ~done

    init_cost = cost_of(c0, X0)
    lam_init = jnp.asarray(1e-4, dtype) if lam0 is None \
        else jnp.asarray(lam0, dtype)
    state = (c0, X0, lam_init, init_cost, 0,
             jnp.asarray(False), jnp.asarray(True), jnp.asarray(0))
    c, X, lam, cost, it, done, _, _ = jax.lax.while_loop(cond, lm_step,
                                                         state)
    return c, X, cost, it, lam, done


@partial(jax.jit, static_argnames=("num_sensors", "huber_delta"))
def _sensor_gn(c, X, of, op, tT, uT, ow, q_f_o, unk_o, o_sens,
               cs, num_sensors: int, huber_delta: float):
    """Three Gauss-Newton iterations on the unknown sensor centers with
    the Golub-Pereyra projected Jacobian (d r / d cs = s P R_f^T) —
    converges quadratically, unlike naive alternation. One jitted call
    (this was an eager op-chain measured in seconds through the remote
    tunnel). Returns (cs, updated uT)."""
    dtype = c.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    Rf = rotm.quat_to_rotmat(q_f_o)
    t_obs = tT.T
    u_rig = uT.T
    for _gn in range(3):
        d = X[op] - c[of] + u_rig
        dn2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
        s = jnp.maximum(jnp.sum(t_obs * d, -1) / dn2, 1e-5)
        r = t_obs - s[:, None] * d
        w = ow * _huber_weight(jnp.sum(r * r, -1), huber_delta)
        w = jnp.where(unk_o, w, 0.0)
        dhat = d / jnp.sqrt(dn2)[:, None]
        P = eye3 - dhat[:, :, None] * dhat[:, None, :]
        RPRt = jnp.einsum("oij,ojk,olk->oil", Rf, P, Rf)
        Hs = jax.ops.segment_sum(
            (w * s * s)[:, None, None] * RPRt, o_sens,
            num_segments=num_sensors)
        gs = jax.ops.segment_sum(
            (w * s)[:, None] * jnp.einsum("oij,oj->oi", Rf, r),
            o_sens, num_segments=num_sensors)
        tr = jnp.trace(Hs, axis1=-2, axis2=-1)
        Hs = Hs + (1e-9 * jnp.maximum(tr, 1e-12))[:, None, None] * eye3
        cs = cs - jnp.linalg.solve(Hs, gs[..., None])[..., 0]
        u_new = -jnp.einsum("oji,oj->oi", Rf, cs[o_sens])
        u_rig = jnp.where(unk_o[:, None], u_new, u_rig)
    return cs, u_rig.T


def _solve_partitioned_flow(scene, tracks, mesh, opts, dtype, num_frames,
                            num_points_pad, o_frame, o_point_np, obs_w,
                            t_obs_np, u_rig_np, cc_i, cc_j, t_cc_np, cc_w,
                            c0, X0, n_obs, use_points, track_ok,
                            unknown_obs, o_sensor, q_frame_o) -> bool:
    """Distributed GP flow over a partitioned mesh: same anneal / grid /
    unknown-rig alternation as the single-chip path, with every _solve_gp
    replaced by the shard_map runner (parallel/partitioned_gp)."""
    from glomap_tpu.parallel.partitioned_gp import PartitionedGP
    runner = PartitionedGP(scene, tracks, mesh, o_frame, o_point_np,
                           obs_w, t_obs_np, cc_i, cc_j, t_cc_np, cc_w,
                           num_frames, dtype=dtype)
    hub = float(opts.thres_loss_function)
    ftol = float(opts.function_tolerance)
    iters = int(opts.max_num_iterations)
    cg_tol = float(opts.cg_relative_tolerance)
    cg_cap = int(opts.cg_max_iterations)

    has_rig_offsets = bool(np.any(np.abs(u_rig_np) > 0))
    if has_rig_offsets:
        c1, X1, _, _ = runner.solve(c0, X0, np.zeros_like(u_rig_np), hub,
                                    ftol, iters, cg_iters=cg_cap, cg_tol=cg_tol)
        d_base = X1[o_point_np] - c1[o_frame]
        w_np = np.asarray(obs_w, np.float64)

        def cost_at_scale(sg):
            d = sg * d_base + u_rig_np
            dn2 = np.maximum(np.sum(d * d, -1), 1e-12)
            s = np.maximum(np.sum(t_obs_np * d, -1) / dn2, 1e-5)
            r = t_obs_np - s[:, None] * d
            r2 = np.sum(r * r, -1)
            return float(np.sum(w_np * np.where(
                r2 <= hub * hub, r2,
                2.0 * hub * np.sqrt(np.maximum(r2, 1e-30)) - hub * hub)))

        grid = np.exp(np.linspace(np.log(1e-3), np.log(1e3), 121))
        costs = np.asarray([cost_at_scale(sg) for sg in grid])
        sg = float(grid[int(np.argmin(costs))])
        c2, X2, _, _ = runner.solve(sg * c1, sg * X1, u_rig_np, 1e3, ftol,
                                    iters, cg_iters=cg_cap, cg_tol=cg_tol)
        c, X, cost, it = runner.solve(c2, X2, u_rig_np, hub, ftol, iters,
                                      cg_iters=cg_cap, cg_tol=cg_tol)
    else:
        c, X, cost, it = runner.solve(c0, X0, u_rig_np, hub, ftol, iters,
                                      cg_iters=cg_cap, cg_tol=cg_tol)

    # unknown cam_from_rig: local (unsharded) sensor GN + re-solve rounds
    has_unknown = use_points and n_obs > 0 and \
        bool((~scene.sensor_known).any()) and bool(unknown_obs.any())
    if has_unknown:
        num_sensors = len(scene.sensor_quat)
        of = jnp.asarray(o_frame)
        op = jnp.asarray(o_point_np)
        tT = jnp.asarray(np.ascontiguousarray(t_obs_np.T), dtype=dtype)
        uT = jnp.asarray(np.ascontiguousarray(u_rig_np.T), dtype=dtype)
        ow = jnp.asarray(obs_w, dtype=dtype)
        q_f_o = jnp.asarray(q_frame_o, dtype=dtype)
        unk_o = jnp.asarray(unknown_obs)
        o_sens = jnp.asarray(o_sensor.astype(np.int32))
        cs = jnp.zeros((num_sensors, 3), dtype=dtype)
        for _ in range(3):
            cs, uT = _sensor_gn(jnp.asarray(c, dtype=dtype),
                                jnp.asarray(X, dtype=dtype), of, op, tT,
                                uT, ow, q_f_o, unk_o, o_sens, cs,
                                num_sensors, hub)
            c, X, cost, it = runner.solve(c, X, np.asarray(uT).T, hub,
                                          ftol, iters, cg_iters=cg_cap, cg_tol=cg_tol)
        cs_np = np.asarray(cs, dtype=np.float64)
        unk_sensors = np.nonzero(~scene.sensor_known)[0]
        t_s = -rotm.quat_rotate(scene.sensor_quat[unk_sensors],
                                cs_np[unk_sensors])
        scene.sensor_trans[unk_sensors] = t_s
        scene.sensor_known[unk_sensors] = True

    if not (np.all(np.isfinite(c)) and np.all(np.isfinite(X))):
        return False
    if opts.optimize_positions:
        scene.frame_trans[:] = -rotm.quat_rotate(scene.frame_quat, c)
    if opts.optimize_points and tracks.num_tracks:
        tracks.xyz[:] = X[:tracks.num_tracks]
        if use_points:
            tracks.valid &= track_ok
    return True



def _gp_segment_iters(n_obs: int, max_iters: int) -> int:
    """LM iterations per device call, capped so no single XLA execution
    exceeds ~20 s: the tunneled shared chip KILLS executions running
    longer than ~60-90 s ("TPU worker process crashed or restarted" —
    measured round 5: 100 LM iters at 2.4M obs crashed, 40 survived;
    the conservative per-iteration model is obs / 1.6e6 s, the measured
    rate at 1M obs). Small problems return >= max_iters so the common
    path stays ONE device call with the exact pre-segmentation graph."""
    t_iter = max(n_obs, 1) / _GP_OBS_ITERS_PER_S
    return max(5, int(_SEGMENT_TARGET_S / t_iter))


def _solve_gp_segmented(c, X, of, op, tT, uT, ow, ci, cj, tccT, cw,
                        num_frames, num_points, hub, ftol, max_iters,
                        cg_iters, cg_tol, point_width):
    """Host-segmented _solve_gp: bounded-duration device calls with the
    LM damping carried between segments (same trajectory as the single
    call modulo the segment boundaries). The final partial segment runs
    at the full segment length (iteration budget may overshoot by up to
    seg-1 — never truncates)."""
    seg = _gp_segment_iters(int(of.shape[0]), int(max_iters))
    if seg >= max_iters:
        c, X, cost, it, _lam, _done = _solve_gp(
            c, X, of, op, tT, uT, ow, ci, cj, tccT, cw,
            num_frames, num_points, hub, ftol, max_iters, cg_iters,
            cg_tol, point_width)
        return c, X, cost, int(it)
    lam = jnp.asarray(1e-4, c.dtype)
    it_total = 0
    while True:
        c, X, cost, it, lam, done = _solve_gp(
            c, X, of, op, tT, uT, ow, ci, cj, tccT, cw,
            num_frames, num_points, hub, ftol, seg, cg_iters,
            cg_tol, point_width, lam0=lam)
        it_total += int(it)
        logger.debug("GP segment: %d iters (total %d/%d), cost %.4e",
                     int(it), it_total, max_iters, float(cost))
        if bool(done) or int(it) < seg or it_total >= max_iters:
            return c, X, cost, it_total


def solve_global_positioning(scene: Scene, vg: ViewGraph, tracks: Tracks,
                             opts: GlobalPositionerOptions | None = None,
                             dtype=None, mesh=None) -> bool:
    """Estimate frame positions + track points; updates scene/tracks in
    place. Counterpart of GlobalPositioner::Solve.

    mesh: optional jax.sharding.Mesh — observation/edge arrays sharded on
    its leading axis, parameter blocks replicated; every segment-sum in
    the LM step becomes a local partial + one psum over ICI under XLA
    SPMD (the distributed global-positioning design of SURVEY.md §2.3).
    """
    opts = opts or GlobalPositionerOptions()
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    rng = np.random.default_rng(opts.seed)
    num_frames = scene.num_frames
    num_points = max(tracks.num_tracks, 1)

    # ---- point-to-camera observations ----
    use_points = opts.constraint_type != "ONLY_CAMERAS"
    if use_points and tracks.num_obs:
        lengths = np.bincount(tracks.obs_track[tracks.obs_valid],
                              minlength=tracks.num_tracks)
        track_ok = tracks.valid & (lengths >= opts.min_num_view_per_track)
        reg = scene.frame_registered[scene.image_frame]
        ob_ok = tracks.obs_valid & track_ok[tracks.obs_track] & \
            reg[tracks.obs_image]
        o_img = tracks.obs_image[ob_ok]
        o_frame = scene.image_frame[o_img]
        o_point = tracks.obs_track[ob_ok]
        kp = scene.kp_offset[o_img] + tracks.obs_feature[ob_ok]
        # t_obs = R_cam^T ray (world direction of the observation) —
        # pure-numpy host prep (eager device ops through the remote
        # tunnel cost ~ms each; this path runs per GP call)
        q_img, _ = scene.image_cam_from_world()
        q_o = q_img[o_img]
        t_obs = rotm.quat_rotate(rotm.quat_conj(q_o), scene.kp_ray[kp])
        # rig offset u = R_cam^T t_sensor_from_rig (zero for trivial frames;
        # reference RigBATAPairwiseDirectionError translation_rig term)
        o_sensor = scene.image_sensor[o_img]
        st = scene.sensor_trans[o_sensor].copy()
        unknown_obs = ~scene.sensor_known[o_sensor]
        st[unknown_obs] = 0.0  # unknown offsets start at zero
        u_rig = rotm.quat_rotate(rotm.quat_conj(q_o), st)
        # frame rotation per obs (for the unknown cam_from_rig center
        # updates; reference RigUnknownBATAPairwiseDirectionError)
        q_frame_o = scene.frame_quat[o_frame]
        calib = scene.cam_has_prior_focal[scene.image_camera[o_img]]
        obs_w = np.where(calib, 1.0, 0.5)
    else:
        o_frame = np.zeros(0, np.int32)
        o_point = np.zeros(0, np.int32)
        t_obs = jnp.zeros((0, 3), dtype=dtype)
        u_rig = jnp.zeros((0, 3), dtype=dtype)
        obs_w = np.zeros(0)
        track_ok = np.zeros(tracks.num_tracks, dtype=bool)

    # ---- camera-to-camera constraints ----
    use_cams = opts.constraint_type != "ONLY_POINTS"
    if use_cams and vg.num_pairs:
        from glomap_tpu.scene.view_graph import CONFIG_PANORAMIC
        # pure-rotation pairs carry no translation direction: their t is
        # zeroed by decompose_rel_pose -> excluded from cc constraints
        pv = vg.pair_valid & (vg.pair_config != CONFIG_PANORAMIC)
        im_i, im_j = vg.pair_i[pv], vg.pair_j[pv]
        cc_i = scene.image_frame[im_i]
        cc_j = scene.image_frame[im_j]
        q_img, _ = scene.image_cam_from_world()
        # t_cc = -(R_j^T t_rel): direction from c_i to c_j in world frame
        qj = q_img[im_j]
        t_cc = -rotm.quat_rotate(rotm.quat_conj(qj), vg.pair_trans[pv])
        cc_w = np.ones(len(cc_i))
        if opts.constraint_type == "POINTS_AND_CAMERAS_BALANCED" and \
                len(o_frame) > 0:
            # reference weight_scale_pt = reweight_scale * num_cam_to_cam
            # / num_pt_to_cam where num_pt_to_cam is the TRACK count
            # (global_positioning.cc:219-240); the per-obs 0.5 uncalib
            # factor in obs_w mirrors loss_function_ptcam_uncalibrated
            scale_pt = opts.constraint_reweight_scale * \
                len(cc_i) / max(tracks.num_tracks, 1)
            obs_w = obs_w * scale_pt
            logger.info("Point-to-camera weight scaled: %.4g", scale_pt)
    else:
        cc_i = np.zeros(0, np.int32)
        cc_j = np.zeros(0, np.int32)
        t_cc = jnp.zeros((0, 3), dtype=dtype)
        cc_w = np.zeros(0)

    if len(o_frame) == 0 and len(cc_i) == 0:
        return False
    logger.info(
        "GP constraints (%s): %d point-to-camera, %d camera-to-camera",
        opts.constraint_type, len(o_frame), len(cc_i))

    # ---- initialization (reference: uniform [-100, 100]^3, seeded) ----
    if opts.generate_random_positions and opts.optimize_positions:
        c0 = 100.0 * rng.uniform(-1, 1, size=(num_frames, 3))
    else:
        c0 = scene.frame_centers()
    if opts.generate_random_points and opts.optimize_points:
        X0 = 100.0 * rng.uniform(-1, 1, size=(num_points, 3))
    else:
        X0 = tracks.xyz.copy() if tracks.num_tracks else np.zeros((1, 3))

    # bucket-pad obs/edges/points so repeated GP calls reuse the compiled
    # solver (padded rows carry zero weight)
    from glomap_tpu.utils.padding import bucket_size, pad_axis0
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_obs = len(o_frame)
    n_obs_pad = bucket_size(max(n_obs, 1))
    n_obs_pad += (-n_obs_pad) % n_dev
    o_frame = pad_axis0(np.asarray(o_frame, np.int32), n_obs_pad)
    # pad point ids with the LAST id so the axis stays sorted (the Pallas
    # sorted-window kernels rely on it; padded rows carry zero weight)
    fill_p = int(o_point[-1]) if n_obs else 0
    o_point_np = pad_axis0(np.asarray(o_point, np.int32), n_obs_pad,
                           fill=fill_p)
    t_obs_np = pad_axis0(np.asarray(t_obs), n_obs_pad)
    u_rig_np = pad_axis0(np.asarray(u_rig), n_obs_pad)
    obs_w = pad_axis0(np.asarray(obs_w), n_obs_pad)
    if n_obs:
        unknown_obs = pad_axis0(unknown_obs, n_obs_pad, fill=False)
        o_sensor = pad_axis0(np.asarray(o_sensor, np.int32), n_obs_pad)
        q_frame_o = pad_axis0(np.asarray(q_frame_o), n_obs_pad).copy()
        q_frame_o[n_obs:, 0] = 1.0  # identity quats on padded rows
    n_cc = len(cc_i)
    n_cc_pad = bucket_size(max(n_cc, 1), 64) if n_cc else 0
    n_cc_pad += (-n_cc_pad) % n_dev
    cc_i = pad_axis0(np.asarray(cc_i, np.int32), n_cc_pad) if n_cc else         np.zeros(0, np.int32)
    cc_j = pad_axis0(np.asarray(cc_j, np.int32), n_cc_pad) if n_cc else         np.zeros(0, np.int32)
    t_cc_np = pad_axis0(np.asarray(t_cc), n_cc_pad) if n_cc else         np.zeros((0, 3))
    cc_w = pad_axis0(np.asarray(cc_w), n_cc_pad) if n_cc else np.zeros(0)
    num_points_pad = bucket_size(num_points, 64)
    X0 = pad_axis0(np.asarray(X0), num_points_pad)

    # sorted-point-axis Pallas window (0 = one-hot/fallback path)
    from glomap_tpu.ops.segment_ops import axis_window
    point_width = axis_window(o_point_np)

    if mesh is not None:
        # partition-aware distributed path (parallel/partitioned_gp):
        # points + observations sharded by graph part, frame system
        # psum'd; mirrors the annealing/rig flow below on host arrays
        return _solve_partitioned_flow(
            scene, tracks, mesh, opts, dtype, num_frames, num_points_pad,
            o_frame, o_point_np, obs_w, t_obs_np, u_rig_np, cc_i, cc_j,
            t_cc_np, cc_w, np.asarray(c0, np.float64),
            np.asarray(X0, np.float64), n_obs, use_points, track_ok,
            unknown_obs if n_obs else None,
            o_sensor if n_obs else None,
            q_frame_o if n_obs else None)

    args_static = (num_frames, num_points_pad,
                   float(opts.thres_loss_function),
                   float(opts.function_tolerance),
                   int(opts.max_num_iterations),
                   int(opts.cg_max_iterations),
                   float(opts.cg_relative_tolerance), point_width)
    _sh = _shT = _rep = lambda a: a
    of = _sh(jnp.asarray(o_frame))
    op = _sh(jnp.asarray(o_point_np))
    ow = _sh(jnp.asarray(obs_w, dtype=dtype))
    tT = _shT(jnp.asarray(np.ascontiguousarray(t_obs_np.T), dtype=dtype))
    uT = _shT(jnp.asarray(np.ascontiguousarray(u_rig_np.T), dtype=dtype))
    ci = _sh(jnp.asarray(cc_i))
    cj = _sh(jnp.asarray(cc_j))
    cw = _sh(jnp.asarray(cc_w, dtype=dtype))
    tccT = _shT(jnp.asarray(np.ascontiguousarray(t_cc_np.T), dtype=dtype))
    c0 = _rep(jnp.asarray(c0, dtype=dtype))
    X0 = _rep(jnp.asarray(X0, dtype=dtype))

    has_rig_offsets = bool(np.any(np.abs(u_rig_np) > 0))
    if has_rig_offsets:
        # Known rig offsets are METRIC, so the problem has no scale gauge —
        # but a random init easily settles in a wrong-scale basin where the
        # Huber loss absorbs the rig mismatch. Anneal: (1) solve the
        # scale-free problem (u = 0), (2) pick the global scale that best
        # explains the metric rig offsets by a log-grid search, (3) refine
        # with the offsets enabled. (The reference instead anchors gauge by
        # pinning the first residual scale, global_positioning.cc:484-489.)
        u0 = jnp.zeros_like(uT)
        c1, X1, _, _ = _solve_gp_segmented(
            c0, X0, of, op, tT, u0, ow, ci, cj, tccT, cw, *args_static)

        # scale grid search on host (tiny; avoids tunnel round-trips)
        c1_np = np.asarray(c1, np.float64)
        X1_np = np.asarray(X1, np.float64)
        d_base = X1_np[o_point_np] - c1_np[o_frame]
        w_np = np.asarray(obs_w, np.float64)
        hub = float(opts.thres_loss_function)

        def cost_at_scale(sg):
            d = sg * d_base + u_rig_np
            dn2 = np.maximum(np.sum(d * d, -1), 1e-12)
            s = np.maximum(np.sum(t_obs_np * d, -1) / dn2, 1e-5)
            r = t_obs_np - s[:, None] * d
            r2 = np.sum(r * r, -1)
            return float(np.sum(w_np * np.where(
                r2 <= hub * hub, r2,
                2.0 * hub * np.sqrt(np.maximum(r2, 1e-30)) - hub * hub)))

        grid = np.exp(np.linspace(np.log(1e-3), np.log(1e3), 121))
        costs = np.asarray([cost_at_scale(sg) for sg in grid])
        sg = float(grid[int(np.argmin(costs))])
        # graduated non-convexity: quadratic-ish pass first (large Huber
        # delta smooths the basin), then the robust refinement
        c2, X2, _, _ = _solve_gp_segmented(
            sg * c1, sg * X1, of, op, tT, uT, ow, ci, cj, tccT, cw,
            num_frames, num_points_pad, 1e3,
            float(opts.function_tolerance),
            int(opts.max_num_iterations),
            int(opts.cg_max_iterations),
            float(opts.cg_relative_tolerance), point_width)
        c, X, cost, it = _solve_gp_segmented(
            c2, X2, of, op, tT, uT, ow, ci, cj, tccT, cw, *args_static)
    else:
        c, X, cost, it = _solve_gp_segmented(
            c0, X0, of, op, tT, uT, ow, ci, cj, tccT, cw, *args_static)

    # ---- unknown cam_from_rig: alternate GP <-> sensor-center updates
    # (counterpart of RigUnknownBATAPairwiseDirectionError where the
    # cam_from_rig center is a joint unknown; here it is updated in closed
    # form given (c, X, s*) — a small weighted LS per sensor — and the GP
    # re-solved, which converges in a few rounds)
    has_unknown = use_points and n_obs > 0 and \
        bool((~scene.sensor_known).any()) and bool(unknown_obs.any())
    if has_unknown:
        num_sensors = len(scene.sensor_quat)
        q_f_o = _sh(jnp.asarray(q_frame_o, dtype=dtype))
        unk_o = _sh(jnp.asarray(unknown_obs))
        o_sens = _sh(jnp.asarray(o_sensor.astype(np.int32)))
        cs = _rep(jnp.zeros((num_sensors, 3), dtype=dtype))
        for _ in range(3):
            cs, uT = _sensor_gn(c, X, of, op, tT, uT, ow, q_f_o, unk_o,
                                o_sens, cs, num_sensors,
                                float(opts.thres_loss_function))
            c, X, cost, it = _solve_gp_segmented(
                c, X, of, op, tT, uT, ow, ci, cj, tccT, cw,
                *args_static)
        # write back: sensor_from_rig translation t_s = -R_s c_s
        cs_np = np.asarray(cs, dtype=np.float64)
        unk_sensors = np.nonzero(~scene.sensor_known)[0]
        t_s = -rotm.quat_rotate(scene.sensor_quat[unk_sensors],
                                cs_np[unk_sensors])
        scene.sensor_trans[unk_sensors] = t_s
        scene.sensor_known[unk_sensors] = True

    c = np.asarray(c, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    logger.info("GP solve: %d LM iters, cost %.4e (%d obs)",
                int(it), float(cost), n_obs)
    if not (np.all(np.isfinite(c)) and np.all(np.isfinite(X))):
        return False

    # ConvertResults: t = -R c  (global_positioning.cc:562-585)
    if opts.optimize_positions:
        scene.frame_trans[:] = -rotm.quat_rotate(scene.frame_quat, c)
    if opts.optimize_points and tracks.num_tracks:
        tracks.xyz[:] = X[:tracks.num_tracks]
        if use_points:
            # tracks below min views kept their random init — invalidate
            # (the reference leaves them for downstream reproj filters)
            tracks.valid &= track_ok
    return True


def rescue_unplaced_frames(scene: Scene, vg: ViewGraph, tracks,
                           min_valid_obs: int = 3,
                           max_outlier_frac: float = 0.5) -> int:
    """Re-position registered frames that lost (almost) every valid
    observation — the GP random-init death spiral: a frame LM never
    pulled in from its [-100,100]^3 init fails every reprojection/angle
    filter, ends with zero valid observations, and nothing downstream
    can recover it (completion only re-validates obs that ALREADY
    reproject near the current pose). Measured round 5: exactly one such
    frame out of 800 floated to radius ~1900 and wrecked the Sim3
    alignment of an otherwise p99=0.155-accurate model.

    The rescue solves the frame center from its VALID view-graph pairs
    with all neighbor centers held fixed (the camera-to-camera BATA
    geometry, global_positioning.cc:167-214): c minimizes
    sum_k w_k |P_k (c - a_k)|^2 over neighbor rays (a_k, u_k), with
    Huber IRLS on the perpendicular distance. Host numpy — the frame
    count here is ~0-3 per scene. min_valid_obs=3: a frame below the
    min-track-support threshold cannot be reliably bundle-adjusted
    either, and the pair-direction solve uses strictly more information
    than its residual observations. Returns #frames rescued."""
    if tracks.num_obs == 0 or vg.num_pairs == 0:
        return 0
    ob = tracks.obs_valid & tracks.valid[tracks.obs_track]
    cnt = np.bincount(scene.image_frame[tracks.obs_image[ob]],
                      minlength=scene.num_frames)
    lost = np.nonzero(scene.frame_registered & (cnt < min_valid_obs))[0]
    if len(lost) == 0:
        return 0
    centers = scene.frame_centers()
    img_frame = scene.image_frame
    q_img, _ = scene.image_cam_from_world()
    n = 0
    lost_set = set(lost.tolist())
    for f in lost:
        inc = vg.pair_valid & (
            (img_frame[vg.pair_i] == f) | (img_frame[vg.pair_j] == f))
        idx = np.nonzero(inc)[0]
        if len(idx) < 2:
            continue
        i_im, j_im = vg.pair_i[idx], vg.pair_j[idx]
        f_is_j = img_frame[j_im] == f
        nb_im = np.where(f_is_j, i_im, j_im)
        nb_f = img_frame[nb_im]
        # neighbors must themselves be placed
        good_nb = np.asarray([int(g) not in lost_set for g in nb_f])
        if good_nb.sum() < 2:
            continue
        idx, nb_im, f_is_j = idx[good_nb], nb_im[good_nb], f_is_j[good_nb]
        # world direction from c_i toward c_j: -(R_j^T t_rel)
        qj = q_img[vg.pair_j[idx]]
        t_w = -rotm.quat_rotate(rotm.quat_conj(qj), vg.pair_trans[idx])
        nrm = np.linalg.norm(t_w, axis=-1, keepdims=True)
        ok = nrm[:, 0] > 1e-12
        if ok.sum() < 2:
            continue
        u = np.where(f_is_j[:, None], 1.0, -1.0)[ok] * (t_w / nrm)[ok]
        a = centers[img_frame[nb_im[ok]]]
        # Huber-IRLS point-to-ray LS
        c = a.mean(0)
        scale = np.median(np.linalg.norm(a - c, axis=-1)) + 1e-9
        delta = 0.1 * scale
        w = np.ones(len(a))
        eye = np.eye(3)
        for _ in range(20):
            P = eye[None] - u[:, :, None] * u[:, None, :]
            A = np.einsum("k,kij->ij", w, P) + 1e-9 * eye
            b = np.einsum("k,kij,kj->i", w, P, a)
            c_new = np.linalg.solve(A, b)
            r = np.linalg.norm(np.einsum("kij,kj->ki", P, c_new - a),
                               axis=-1)
            w = np.where(r <= delta, 1.0, delta / np.maximum(r, 1e-12))
            if np.linalg.norm(c_new - c) < 1e-9 * scale:
                c = c_new
                break
            c = c_new
        # sanity: a majority of rays must agree with the solution
        if (r > 3 * delta).mean() > max_outlier_frac:
            continue
        scene.frame_trans[f] = -rotm.quat_rotate(scene.frame_quat[f], c)
        n += 1
        logger.info("Rescued unplaced frame %d from %d neighbor rays "
                    "(residual p90 %.3g)", int(f), len(a),
                    float(np.percentile(r, 90)))
    return n


def deregister_unsupported_frames(scene: Scene, tracks) -> int:
    """Unregister frames that end the pipeline with zero valid
    observations: they carry no geometric support, and ONE such frame
    left at a garbage position dominates any least-squares model
    alignment (and would be written to the output model as a junk pose).
    The reference keeps them registered and relies on the off-by-default
    pruning stage; deregistering is the honest output contract — colmap
    simply does not write unregistered images. Returns #deregistered."""
    if scene.num_frames == 0:
        return 0
    if tracks.num_obs:
        ob = tracks.obs_valid & tracks.valid[tracks.obs_track]
        cnt = np.bincount(scene.image_frame[tracks.obs_image[ob]],
                          minlength=scene.num_frames)
    else:
        cnt = np.zeros(scene.num_frames, dtype=np.int64)
    drop = scene.frame_registered & (cnt == 0)
    n = int(drop.sum())
    if n:
        scene.frame_registered[drop] = False
        logger.warning(
            "Deregistered %d frames with no valid observations: %s",
            n, np.nonzero(drop)[0].tolist()[:20])
    return n
