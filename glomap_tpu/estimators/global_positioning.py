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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import GlobalPositionerOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.ops.linear import cg_generic
from glomap_tpu.scene.arrays import Scene, Tracks
from glomap_tpu.scene.view_graph import ViewGraph


def _huber_weight(r2, delta):
    """IRLS weight of Ceres HuberLoss(delta) on squared norm r2."""
    return jnp.where(r2 <= delta * delta, 1.0,
                     delta / jnp.sqrt(jnp.maximum(r2, 1e-30)))


def _huber_cost(r2, delta):
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2, 2.0 * delta * jnp.sqrt(
        jnp.maximum(r2, 1e-30)) - d2)


@partial(jax.jit, static_argnames=("num_frames", "num_points", "max_iters",
                                   "cg_iters"))
def _solve_gp(c0, X0,
              # point-to-camera observations
              obs_frame, obs_point, t_obs, u_rig, obs_w,
              # camera-to-camera edges (may be empty)
              cc_i, cc_j, t_cc, cc_w,
              num_frames: int, num_points: int,
              huber_delta: float, function_tol: float,
              max_iters: int, cg_iters: int):
    """LM with exact scale projection + point Schur elimination.

    Returns (centers, points, final_cost, iters).
    """
    dtype = c0.dtype

    def scales_and_residuals(c, X):
        d = X[obs_point] - c[obs_frame] + u_rig
        dn2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
        s = jnp.maximum(jnp.sum(t_obs * d, axis=-1) / dn2, 1e-5)
        r = t_obs - s[:, None] * d
        # cam-to-cam
        dc = c[cc_j] - c[cc_i]
        dcn2 = jnp.maximum(jnp.sum(dc * dc, axis=-1), 1e-12)
        sc = jnp.maximum(jnp.sum(t_cc * dc, axis=-1) / dcn2, 1e-5)
        rc = t_cc - sc[:, None] * dc
        return s, r, sc, rc

    def cost_of(c, X):
        s, r, sc, rc = scales_and_residuals(c, X)
        r2 = jnp.sum(r * r, axis=-1)
        rc2 = jnp.sum(rc * rc, axis=-1)
        return (jnp.sum(obs_w * _huber_cost(r2, huber_delta)) +
                jnp.sum(cc_w * _huber_cost(rc2, huber_delta)))

    eye3 = jnp.eye(3, dtype=dtype)

    def lm_step(state):
        c, X, lam, cost, it, done, _ = state
        s, r, sc, rc = scales_and_residuals(c, X)
        w = obs_w * _huber_weight(jnp.sum(r * r, -1), huber_delta)
        wc = cc_w * _huber_weight(jnp.sum(rc * rc, -1), huber_delta)

        # EXACT scale elimination (Golub-Pereyra): eliminating the
        # per-residual scale s (J_s = -d) turns every +-sI3 Jacobian block
        # into a_o * P_o with a_o = w s^2 and P_o = I - dd^T/|d|^2 (the
        # projection orthogonal to the observation baseline). The gradient
        # is unchanged because dL/ds = 0 at the projected scale.
        d = X[obs_point] - c[obs_frame] + u_rig
        dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                             1e-12)
        P = eye3 - dn[:, :, None] * dn[:, None, :]
        a = w * s * s
        aP = a[:, None, None] * P  # (O, 3, 3)

        g_c = jax.ops.segment_sum((w * s)[:, None] * r, obs_frame,
                                  num_segments=num_frames)
        g_X = jax.ops.segment_sum(-(w * s)[:, None] * r, obs_point,
                                  num_segments=num_points)
        dcc = c[cc_j] - c[cc_i]
        dccn = dcc / jnp.maximum(jnp.linalg.norm(dcc, axis=-1, keepdims=True),
                                 1e-12)
        Pc = eye3 - dccn[:, :, None] * dccn[:, None, :]
        ac = wc * sc * sc
        aPc = ac[:, None, None] * Pc
        # cam-to-cam residual t - s(c_j - c_i): dr/dc_i = +s I, dr/dc_j = -s I
        g_c = g_c.at[cc_i].add((wc * sc)[:, None] * rc)
        g_c = g_c.at[cc_j].add(-(wc * sc)[:, None] * rc)

        # block-diagonal Hessian blocks (3x3 per frame / per point)
        B_f = jax.ops.segment_sum(aP, obs_frame, num_segments=num_frames)
        B_f = B_f.at[cc_i].add(aPc).at[cc_j].add(aPc)
        B_p = jax.ops.segment_sum(aP, obs_point, num_segments=num_points)

        def damp(B):
            diag = jnp.diagonal(B, axis1=-2, axis2=-1)
            tr = jnp.maximum(jnp.sum(diag, -1), 1e-10)
            return B + (lam * tr / 3.0 + 1e-12 * tr)[:, None, None] * eye3

        B_f_d = damp(B_f)
        B_p_d = damp(B_p)
        Bp_inv = jnp.linalg.inv(B_p_d)

        def apply_obs(M, v_per_obs):
            return jnp.einsum("oij,oj->oi", M, v_per_obs)

        # rhs of the Schur system on frames: b_f = -g_c - H_cp Bp_inv (-g_X)
        z = jnp.einsum("tij,tj->ti", Bp_inv, -g_X)
        b_f = -g_c - jax.ops.segment_sum(apply_obs(-aP, z[obs_point]),
                                         obs_frame, num_segments=num_frames)

        def schur_mv(v):
            out = jnp.einsum("fij,fj->fi", B_f_d, v)
            out = out.at[cc_i].add(apply_obs(-aPc, v[cc_j]))
            out = out.at[cc_j].add(apply_obs(-aPc, v[cc_i]))
            Hpcv = jax.ops.segment_sum(apply_obs(-aP, v[obs_frame]),
                                       obs_point, num_segments=num_points)
            z2 = jnp.einsum("tij,tj->ti", Bp_inv, Hpcv)
            out = out - jax.ops.segment_sum(apply_obs(-aP, z2[obs_point]),
                                            obs_frame,
                                            num_segments=num_frames)
            return out

        # block-Jacobi preconditioner from the damped frame blocks
        Bf_inv = jnp.linalg.inv(B_f_d)
        precond = lambda rr: jnp.einsum("fij,fj->fi", Bf_inv, rr)

        dc_step = cg_generic(schur_mv, b_f, max_iters=cg_iters, tol=1e-8,
                             precond=precond)
        # back-substitute points: dX = Bp_inv (-g_X - H_pc dc)
        Hpcdc = jax.ops.segment_sum(apply_obs(-aP, dc_step[obs_frame]),
                                    obs_point, num_segments=num_points)
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
        done = accept & (rel_decrease < function_tol)
        cost = jnp.where(accept, new_cost, cost)
        return (c, X, lam, cost, it + 1, done, accept)

    def cond(state):
        _, _, _, _, it, done, _ = state
        return (it < max_iters) & ~done

    init_cost = cost_of(c0, X0)
    state = (c0, X0, jnp.asarray(1e-4, dtype), init_cost, 0,
             jnp.asarray(False), jnp.asarray(True))
    c, X, lam, cost, it, _, _ = jax.lax.while_loop(cond, lm_step, state)
    return c, X, cost, it


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
        pv = vg.pair_valid
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
            scale_pt = opts.constraint_reweight_scale * \
                len(cc_i) / max(len(o_frame), 1)
            obs_w = obs_w * scale_pt
    else:
        cc_i = np.zeros(0, np.int32)
        cc_j = np.zeros(0, np.int32)
        t_cc = jnp.zeros((0, 3), dtype=dtype)
        cc_w = np.zeros(0)

    if len(o_frame) == 0 and len(cc_i) == 0:
        return False

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
    o_point_np = pad_axis0(np.asarray(o_point, np.int32), n_obs_pad)
    t_obs = jnp.asarray(pad_axis0(np.asarray(t_obs), n_obs_pad), dtype=dtype)
    u_rig = jnp.asarray(pad_axis0(np.asarray(u_rig), n_obs_pad), dtype=dtype)
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
    t_cc = jnp.asarray(pad_axis0(np.asarray(t_cc), n_cc_pad), dtype=dtype)         if n_cc else jnp.zeros((0, 3), dtype=dtype)
    cc_w = pad_axis0(np.asarray(cc_w), n_cc_pad) if n_cc else np.zeros(0)
    num_points_pad = bucket_size(num_points, 64)
    X0 = pad_axis0(np.asarray(X0), num_points_pad)

    args_static = (num_frames, num_points_pad,
                   float(opts.thres_loss_function),
                   float(opts.function_tolerance),
                   int(opts.max_num_iterations), 100)
    if mesh is not None:
        from glomap_tpu.parallel.mesh import replicate, shard_obs
        _sh = lambda a: shard_obs(mesh, a)
        _rep = lambda a: replicate(mesh, a)
    else:
        _sh = _rep = lambda a: a
    of = _sh(jnp.asarray(o_frame))
    op = _sh(jnp.asarray(o_point_np))
    ow = _sh(jnp.asarray(obs_w, dtype=dtype))
    t_obs = _sh(t_obs)
    u_rig = _sh(u_rig)
    ci = _sh(jnp.asarray(cc_i))
    cj = _sh(jnp.asarray(cc_j))
    cw = _sh(jnp.asarray(cc_w, dtype=dtype))
    t_cc = _sh(t_cc)
    c0 = _rep(jnp.asarray(c0, dtype=dtype))
    X0 = _rep(jnp.asarray(X0, dtype=dtype))

    has_rig_offsets = bool(np.any(np.abs(np.asarray(u_rig)) > 0))
    if has_rig_offsets:
        # Known rig offsets are METRIC, so the problem has no scale gauge —
        # but a random init easily settles in a wrong-scale basin where the
        # Huber loss absorbs the rig mismatch. Anneal: (1) solve the
        # scale-free problem (u = 0), (2) pick the global scale that best
        # explains the metric rig offsets by a log-grid search, (3) refine
        # with the offsets enabled. (The reference instead anchors gauge by
        # pinning the first residual scale, global_positioning.cc:484-489.)
        u0 = jnp.zeros_like(u_rig)
        c1, X1, _, _ = _solve_gp(c0, X0,
                                 of, op, t_obs, u0, ow, ci, cj, t_cc, cw,
                                 *args_static)

        def cost_at_scale(sg):
            d = sg * (X1[op] - c1[of]) + u_rig
            dn2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
            s = jnp.maximum(jnp.sum(t_obs * d, -1) / dn2, 1e-5)
            r = t_obs - s[:, None] * d
            r2 = jnp.sum(r * r, -1)
            return jnp.sum(ow * _huber_cost(r2,
                                            float(opts.thres_loss_function)))

        grid = jnp.exp(jnp.linspace(np.log(1e-3), np.log(1e3), 121))
        costs = jax.vmap(cost_at_scale)(grid.astype(dtype))
        sg = float(grid[int(jnp.argmin(costs))])
        # graduated non-convexity: quadratic-ish pass first (large Huber
        # delta smooths the basin), then the robust refinement
        c2, X2, _, _ = _solve_gp(sg * c1, sg * X1, of, op, t_obs, u_rig,
                                 ow, ci, cj, t_cc, cw,
                                 num_frames, num_points_pad, 1e3,
                                 float(opts.function_tolerance),
                                 int(opts.max_num_iterations), 100)
        c, X, cost, it = _solve_gp(c2, X2, of, op, t_obs, u_rig,
                                   ow, ci, cj, t_cc, cw, *args_static)
    else:
        c, X, cost, it = _solve_gp(c0, X0,
                                   of, op, t_obs, u_rig, ow, ci, cj, t_cc,
                                   cw, *args_static)

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
        Rf = rotm.quat_to_rotmat(q_f_o)
        eye3 = jnp.eye(3, dtype=dtype)
        cs = _rep(jnp.zeros((num_sensors, 3), dtype=dtype))
        for _ in range(3):
            # Gauss-Newton on the sensor centers with the Golub-Pereyra
            # projected Jacobian (d r / d cs = s P R_f^T): converges
            # quadratically, unlike naive alternation.
            for _gn in range(3):
                d = X[op] - c[of] + u_rig
                dn2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
                s = jnp.maximum(jnp.sum(t_obs * d, -1) / dn2, 1e-5)
                r = t_obs - s[:, None] * d
                w = ow * _huber_weight(jnp.sum(r * r, -1),
                                       float(opts.thres_loss_function))
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
                Hs = Hs + (1e-9 * jnp.maximum(tr, 1e-12))[:, None, None] * \
                    eye3
                cs = cs - jnp.linalg.solve(Hs, gs[..., None])[..., 0]
                u_new = -jnp.einsum("oji,oj->oi", Rf, cs[o_sens])
                u_rig = jnp.where(unk_o[:, None], u_new, u_rig)
            c, X, cost, it = _solve_gp(c, X, of, op, t_obs, u_rig, ow,
                                       ci, cj, t_cc, cw, *args_static)
        # write back: sensor_from_rig translation t_s = -R_s c_s
        cs_np = np.asarray(cs, dtype=np.float64)
        unk_sensors = np.nonzero(~scene.sensor_known)[0]
        t_s = -rotm.quat_rotate(scene.sensor_quat[unk_sensors],
                                cs_np[unk_sensors])
        scene.sensor_trans[unk_sensors] = t_s
        scene.sensor_known[unk_sensors] = True

    c = np.asarray(c, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
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
