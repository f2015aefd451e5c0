"""Global bundle adjustment: Schur-eliminated LM on batched autodiff blocks.

Counterpart of glomap/estimators/bundle_adjustment.{h,cc} (BundleAdjuster):
reprojection-error BA over frame poses, intrinsics and points; Huber loss
(1 px); quaternion manifold; first frame pose fixed for gauge; principal
point frozen unless optimize_principal_point; Ceres SPARSE_SCHUR with
points in elimination group 0 (bundle_adjustment.cc:95-104,192-310).

TPU-first design (replaces Ceres autodiff + CHOLMOD SPARSE_SCHUR):
  * Per-observation residual (2,) and Jacobian blocks J_pose (2,6),
    J_point (2,3), J_intr (2,16) come from ONE vmapped jacfwd over the
    retraction (q ⊗ Exp(w), t + dt, X + dX, params + T @ di) — the
    "Jacobian blocks as batched kernels" requirement of BASELINE.json.
  * Intrinsics are optimized in the canonical 16-slot parameterization
    through a per-camera tie/mask matrix T that reproduces each COLMAP
    model's true parameter structure (single focal ties fx=fy; only the
    model's own distortion slots move; principal point per flag).
  * Points are Schur-eliminated with batched damped 3x3 inverses; the
    reduced camera system (6 per frame + 16 per camera) is solved
    matrix-free by block-Jacobi PCG where each matvec is a handful of
    einsums + segment-sums over observations — O(obs) HBM traffic,
    shardable over observations with psum (see parallel/).
  * LM accept/reject loop runs as one jitted lax.while_loop.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import BundleAdjusterOptions
from glomap_tpu.math import rotation as rotm
from glomap_tpu.ops import camera_models as cm
from glomap_tpu.ops.linear import cg_generic
from glomap_tpu.scene.arrays import Scene, Tracks

# segmentation model for bounded-duration device calls (see
# solve_bundle_adjustment): target seconds per XLA execution and
# the conservative obs*iters/s throughput used to size segments
_SEGMENT_TARGET_S = 20.0
_BA_OBS_ITERS_PER_S = 1e7

# canonical distortion slots used by each COLMAP model (see
# ops/camera_models.canonicalize)
_DIST_SLOTS = {
    cm.SIMPLE_PINHOLE: (), cm.PINHOLE: (),
    cm.SIMPLE_RADIAL: (4,), cm.RADIAL: (4, 5),
    cm.OPENCV: (4, 5, 11, 12),
    cm.OPENCV_FISHEYE: (4, 5, 6, 7),
    cm.FULL_OPENCV: (4, 5, 6, 8, 9, 10, 11, 12),
    cm.FOV: (15,),
    cm.SIMPLE_RADIAL_FISHEYE: (4,), cm.RADIAL_FISHEYE: (4, 5),
    cm.THIN_PRISM_FISHEYE: (4, 5, 6, 7, 11, 12, 13, 14),
}
_SINGLE_FOCAL = {cm.SIMPLE_PINHOLE, cm.SIMPLE_RADIAL, cm.RADIAL,
                 cm.SIMPLE_RADIAL_FISHEYE, cm.RADIAL_FISHEYE}


def intrinsic_tie_matrix(model_id: int, optimize_intrinsics: bool,
                         optimize_principal_point: bool) -> np.ndarray:
    """(16, 16) matrix T: canonical delta = T @ raw 16-dim update.

    Reproduces the reference's per-model parameter structure + subset
    manifold on the principal point (bundle_adjustment.cc:273-293)."""
    T = np.zeros((16, 16))
    if optimize_intrinsics:
        if model_id in _SINGLE_FOCAL:
            T[0, 0] = T[1, 0] = 1.0  # tied focal driven by slot 0
        else:
            T[0, 0] = T[1, 1] = 1.0
        for s in _DIST_SLOTS[model_id]:
            T[s, s] = 1.0
    if optimize_principal_point:
        T[2, 2] = T[3, 3] = 1.0
    return T


def order_obs_for_locality(o_frame, o_point, num_tracks: int):
    """Renumber tracks by mean observing frame and order observations by
    the new track id (host-side, once per solve).

    Gives BOTH hot index axes bounded per-block id windows for the Pallas
    windowed kernels: the point axis is sorted outright, and the frame
    axis inherits capture locality (a track spans nearby frames in
    sequential/spatial captures), so any 2048-obs block touches a small
    frame window. Returns (obs_perm, point_perm, new_of_old): point
    tables reindex as tab_new = tab_old[point_perm]; results map back
    via X_old = X_new[new_of_old]."""
    sums = np.bincount(o_point, weights=o_frame.astype(np.float64),
                       minlength=num_tracks)
    cnts = np.maximum(np.bincount(o_point, minlength=num_tracks), 1)
    point_perm = np.argsort(sums / cnts, kind="stable")
    new_of_old = np.empty(num_tracks, dtype=np.int64)
    new_of_old[point_perm] = np.arange(num_tracks)
    obs_perm = np.argsort(new_of_old[o_point], kind="stable")
    return obs_perm, point_perm, new_of_old


def _axis_window(ids_padded: np.ndarray, cap: int = 4096) -> int:
    """Static kernel window for an id axis, or 0 if locality is too weak
    for the windowed kernels to pay off."""
    from glomap_tpu.ops.segment_ops import axis_window
    return axis_window(ids_padded, cap)


def _huber_weight(r2, delta):
    return jnp.where(r2 <= delta * delta, 1.0,
                     delta / jnp.sqrt(jnp.maximum(r2, 1e-30)))


def _huber_cost(r2, delta):
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2,
                     2.0 * delta * jnp.sqrt(jnp.maximum(r2, 1e-30)) - d2)


def _residual_one(qf, tf, qs, ts, cpar, kind, X, uv, T, z):
    """Residual for one observation at tangent update z (25 or 31):
    [frame w(3), frame dt(3), dX(3), intr(16)[, sensor ws(3), dts(3)]]."""
    w, dt, dX, di = z[0:3], z[3:6], z[6:9], z[9:25]
    qf2 = rotm.quat_mul(qf, rotm.so3_exp_quat(w))
    x = rotm.quat_rotate(qf2, X + dX) + tf + dt
    if z.shape[0] > 25:
        qs = rotm.quat_mul(qs, rotm.so3_exp_quat(z[25:28]))
        ts = ts + z[28:31]
    x = rotm.quat_rotate(qs, x) + ts
    cp = cpar + T @ di
    return cm.img_from_cam(cp, kind, x) - uv


def _resid_and_jac(qf, tf, qs, ts, cpar, kind, X, uv, T, zdim=25):
    z0 = jnp.zeros((zdim,), dtype=X.dtype)
    f = lambda z: _residual_one(qf, tf, qs, ts, cpar, kind, X, uv, T, z)
    r = f(z0)
    J = jax.jacfwd(f)(z0)  # (2, zdim)
    return r, J


_resid_and_jac_v = jax.vmap(_resid_and_jac,
                            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))


@partial(jax.jit, static_argnames=("num_frames", "num_cams", "num_points",
                                   "num_sensors", "max_iters", "cg_iters",
                                   "cg_tol",
                                   "optimize_points", "fast_path",
                                   "optimize_rig", "point_width",
                                   "frame_width", "one_hot_budget",
                                   "mesh_axis"))
def _solve_ba(frame_quat, frame_trans, cam_params, points,
              # static per-obs data
              o_frame, o_cam, o_point, o_sensor_q, o_sensor_t, o_kind,
              o_uv, cam_T, o_w,
              # per-frame pose mask (6,) and flags
              frame_mask,
              num_frames: int, num_cams: int, num_points: int,
              huber_delta: float, function_tol: float,
              max_iters: int, cg_iters: int, optimize_points: bool,
              fast_path: bool = False,
              # rig-pose optimization (reference optimize_rig_poses):
              # sensor poses become unknowns; o_sensor indexes them
              o_sensor=None, sensor_quat=None, sensor_trans=None,
              sensor_mask=None, num_sensors: int = 0,
              optimize_rig: bool = False,
              # any 2048-obs block spans at most `point_width` distinct
              # points / `frame_width` distinct frames (0 = unbounded);
              # see order_obs_for_locality
              point_width: int = 0, frame_width: int = 0,
              one_hot_budget: int = 1 << 28,
              # per-camera kind (C,) int for the all-kind fast path
              # (perspective/fisheye/FOV); None = all perspective
              cam_kind=None,
              # LM damping carry for host-segmented solves (the
              # tunneled chip kills single executions >~60-90 s; see
              # solve_bundle_adjustment's segment loop). None = 1e-4.
              lam0=None,
              # replicated (S,) sensor->camera map (required under
              # shard_map where local obs may not cover every sensor;
              # None = derive from the local obs)
              cam_of_sensor=None,
              # inexact-Newton forcing tolerance for the inner CG on the
              # reduced camera system (Ceres `eta`, solver.h; its
              # ITERATIVE_SCHUR default is 1e-1 — ours is tighter)
              cg_tol: float = 1e-2,
              # consecutive-rejection exit (the Ceres min-trust-region
              # analog); throughput benches raise it to force a fixed
              # iteration count
              max_rejections: int = 8,
              # partition-aware SPMD (parallel/partitioned_ba): when set,
              # the solver runs INSIDE shard_map with observations AND
              # points sharded by graph part and frame/camera parameter
              # blocks replicated. Point-axis reductions stay local (a
              # point's observations live on one device by construction);
              # frame/camera reductions psum over this mesh axis — the
              # "local Schur partials + psum of the reduced camera
              # system" design of SURVEY.md §2.3.
              mesh_axis: str | None = None):
    """Lane-major LM solver: all per-observation Jacobian data lives as
    (k, O) row stacks (observations in the 128-lane axis), never as
    (O, 2, k) blocks — a (O, 2, 25) f32 array tile-pads ~20x on TPU and
    sets a ~2M-observation HBM ceiling; (50, O) pads ~1.1x.

    Index-axis traffic (gathers into the obs axis, segment reductions out
    of it) runs entirely as one-hot MXU matmuls or the Pallas
    sorted-window kernels — never as TPU lane gathers (~5 GB/s measured)
    or 1-D scatter-adds (~1 ms per 100k-element row): that single change
    took the 100-frame/100k-obs benchmark from 8.5 to >100 LM iters/s on
    one v5e chip.

    The per-camera intrinsic tie/mask matrix T is applied AFTER reduction
    (g_c <- T^T g_raw, B_c <- T^T B T, J v <- J (T v)) — exact because T
    is constant per camera — so no per-observation (16, 16) products ever
    materialize."""
    dtype = points.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    eye16 = jnp.eye(16, dtype=dtype)
    zdim = 31 if optimize_rig else 25
    num_obs = o_frame.shape[0]
    o_T = cam_T[o_cam]  # only used by the autodiff residual cost

    # TPU scatter-adds are the slowest ops in the solve (~1 ms per
    # 100k-element 1-D scatter, measured on v5e); when a segment axis is
    # small enough, reduce with a one-hot matmul instead — XLA fuses the
    # one-hot generation into the dot, so it is MXU work with no
    # materialized (O, n) operand. Beyond the budget, a SORTED segment
    # axis (the point axis: observations are ordered by track) reduces
    # through the Pallas blocked local-one-hot kernel — O(O * width)
    # work independent of n_seg, the city-scale path. Unsorted + over
    # budget falls back to per-row 1-D segment sums.
    from glomap_tpu.ops.segment_ops import make_axis_pair_ops as _mao

    def make_axis_ops(idx, n_seg, sorted_width: int = 0, psum: bool = True):
        """See ops/segment_ops.make_axis_pair_ops (the plain reduce/gather
        ops are shared with GP via make_axis_ops; the fused pair variants
        are only consumed here). gather_dot (the 4th element) stays on the
        shelf: the CG loop deliberately composes plain ops per the
        measured A/B (BENCH_NOTES fused-kernel table)."""
        return _mao(idx, n_seg, num_obs, dtype, sorted_width,
                    one_hot_budget,
                    psum_axis=mesh_axis if psum else None)[:3]

    # point-axis traffic is LOCAL under partition sharding: observations
    # are co-located with their point's shard (parallel/partitioned_ba)
    reduce_f, gather_f, rpairs_f = make_axis_ops(
        o_frame, num_frames, frame_width)
    reduce_c, gather_c, rpairs_c = make_axis_ops(o_cam, num_cams)
    reduce_p, gather_p, rpairs_p = make_axis_ops(
        o_point, num_points, point_width, psum=False)
    if optimize_rig:
        reduce_s, gather_s, rpairs_s = make_axis_ops(o_sensor, num_sensors)
    else:
        reduce_s = gather_s = rpairs_s = None

    def jt_pairs(n):
        """J^T y rows for J as a (2n, O) row stack, y (2, O)."""
        return tuple(((i, 0), (n + i, 1)) for i in range(n))

    def gram_pairs(n, m):
        """out[i*m+j] = sum_r A[r,i] B[r,j] for (2n, O) x (2m, O)."""
        return tuple(((i, j), (n + i, m + j))
                     for i in range(n) for j in range(m))

    def corr_pairs(k):
        """E[i*k+l] = sum_m D[i*3+m] C[l*3+m] (Schur correction)."""
        return tuple(tuple((i * 3 + m, l * 3 + m) for m in range(3))
                     for i in range(k) for l in range(k))

    def psum_scalar(x):
        return jax.lax.psum(x, mesh_axis) if mesh_axis is not None else x

    fm_o = gather_f(frame_mask)  # (6, O)
    if optimize_rig:
        sm_o = gather_s(sensor_mask)

    def rows_mm(A3, B3, n, m):
        """A3 (2, n, O), B3 (2, m, O) whitened row stacks; returns the
        n*m rows k[i*m+j] = sum_r A3[r, i] B3[r, j]."""
        return [A3[0, i] * B3[0, j] + A3[1, i] * B3[1, j]
                for i in range(n) for j in range(m)]

    def jt(J3, y):
        """J^T y rows: J3 (2, k, O), y (2, O) -> (k, O); no stacking."""
        return J3[0] * y[0] + J3[1] * y[1]

    def app(J3, v_o):
        """J v rows: J3 (2, k, O), v_o (k, O) -> (2, O)."""
        return jnp.einsum("rko,ko->ro", J3, v_o)

    def gather_sensor(sq, st):
        if optimize_rig:
            return sq[o_sensor], st[o_sensor]
        return o_sensor_q, o_sensor_t

    # --- lane-major fast-path plumbing ---------------------------------
    # Per-obs pose data comes from small per-(frame, sensor) tables
    # gathered on the TRAILING axis — a direct (O, 3, 3) rotmat gather
    # tile-pads ~113x and re-introduces the HBM ceiling the row layout
    # removes. o_fs indexes the (F*S, .) tables.
    if cam_kind is None:
        cam_kind = jnp.zeros((num_cams,), jnp.int32)
    kind_col = cam_kind.reshape(num_cams, 1)
    use_tables = fast_path and (o_sensor is not None)
    if use_tables:
        n_sens_t = max(num_sensors, 1)
        o_fs = o_frame * n_sens_t + o_sensor
        # frame window of span w covers an fs window of span w * S
        reduce_fs, gather_fs = make_axis_ops(
            o_fs, num_frames * n_sens_t, frame_width * n_sens_t)[:2]
        uvT_const = o_uv.T  # (2, O), constant
        # sensor -> camera (functional: every sensor has one camera);
        # lets the CG matvec ride ONE fused (F*S, 22/28)-column table
        # instead of separate frame/camera gathers + reductions. Under
        # shard_map the local obs may not cover every sensor, so the
        # distributed callers pass the host-derived replicated map
        # (cam_of_sensor = scene.sensor_camera); a pmax reconciliation
        # was measured to SEGFAULT the XLA:CPU multi-process compile
        # (test_multihost), so no collective is used here.
        if cam_of_sensor is not None:
            cam_of_s = cam_of_sensor.astype(jnp.int32)
        else:
            cam_of_s = jnp.zeros((n_sens_t,), jnp.int32).at[
                o_sensor].set(o_cam)

    def _persp_rows(fq, ft, sq, st, cp, X):
        """((M9 (9,O), S9 (9,O), b3 (3,O), X3 (3,O), uvT (2,O), k16
        (16,O), kind1 (1,O)), ts3 (3,O)) via per-(frame, sensor) tables
        expanded with one-hot matmuls; ts3 feeds the rig-pose kernel
        columns."""
        from glomap_tpu.math import rotation as rotm
        Rf = rotm.quat_to_rotmat(fq)  # (F, 3, 3)
        Rs = rotm.quat_to_rotmat(sq)  # (S, 3, 3)
        M_fs = jnp.einsum("sij,fjk->fsik", Rs, Rf)  # (F, S, 3, 3)
        b_fs = jnp.einsum("sij,fj->fsi", Rs, ft) + st[None]  # (F, S, 3)
        # one table gather for [M9 | S9 | b3 | ts3] (24 columns)
        F_, S_ = fq.shape[0], Rs.shape[0]
        S_rep = jnp.broadcast_to(Rs.reshape(1, -1, 9), (F_, S_, 9))
        ts_rep = jnp.broadcast_to(st.reshape(1, -1, 3), (F_, S_, 3))
        tab = jnp.concatenate([M_fs.reshape(-1, 9), S_rep.reshape(-1, 9),
                               b_fs.reshape(-1, 3), ts_rep.reshape(-1, 3)],
                              axis=1)
        rows = gather_fs(tab)  # (24, O)
        X3 = gather_p(X)
        # intrinsics + kind ride ONE per-camera table gather (17 columns)
        cam_tab = jnp.concatenate(
            [cp, kind_col.astype(cp.dtype)], axis=1)  # (C, 17)
        krows = gather_c(cam_tab)
        return ((rows[0:9], rows[9:18], rows[18:21], X3, uvT_const,
                 krows[0:16], krows[16:17]), rows[21:24])

    def _persp_resid_rows(M9, S9, b3, X3, uvT, k16, kind1):
        """Residual only (2, O), lane-major, all kinds (cost evals)."""
        p0 = M9[0] * X3[0] + M9[1] * X3[1] + M9[2] * X3[2] + b3[0]
        p1 = M9[3] * X3[0] + M9[4] * X3[1] + M9[5] * X3[2] + b3[1]
        p2 = M9[6] * X3[0] + M9[7] * X3[1] + M9[8] * X3[2] + b3[2]
        z = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
        x = p0 / z
        y = p1 / z
        kind = kind1[0]
        # kind base map (mirrors ops/pallas_kernels._projection_kernel)
        rr2 = x * x + y * y
        rr = jnp.sqrt(jnp.maximum(rr2, 1e-18))
        small_r = rr < 1e-6
        a_fe = jnp.where(small_r, 1.0 - rr2 / 3.0, jnp.arctan(rr) / rr)
        omega = k16[15]
        w_ok = jnp.abs(omega) > 1e-6
        w_safe = jnp.where(w_ok, omega, 1e-6)
        tanh_ = jnp.tan(0.5 * w_safe)
        a_fov_raw = jnp.where(small_r, 2.0 * tanh_ / w_safe,
                              jnp.arctan(2.0 * rr * tanh_) / (w_safe * rr))
        a_fov = jnp.where(w_ok, a_fov_raw, 1.0)
        a = jnp.where(kind == 1.0, a_fe,
                      jnp.where(kind == 2.0, a_fov, 1.0))
        u = x * a
        v = y * a
        r2 = u * u + v * v
        r4 = r2 * r2
        r6 = r4 * r2
        num = 1.0 + k16[4] * r2 + k16[5] * r4 + k16[6] * r6 \
            + k16[7] * r4 * r4
        den = 1.0 + k16[8] * r2 + k16[9] * r4 + k16[10] * r6
        radial = num / den
        xy2 = 2.0 * u * v
        du = u * radial + k16[11] * xy2 + k16[12] * (r2 + 2.0 * u * u) \
            + k16[13] * r2
        dv = v * radial + k16[12] * xy2 + k16[11] * (r2 + 2.0 * v * v) \
            + k16[14] * r2
        return jnp.stack([k16[0] * du + k16[2] - uvT[0],
                          k16[1] * dv + k16[3] - uvT[1]])

    def compute_cost(fq, ft, cp, X, sq=None, st=None):
        if use_tables:
            s_q = sq if optimize_rig else sensor_quat
            s_t = st if optimize_rig else sensor_trans
            rows, _ = _persp_rows(fq, ft, s_q, s_t, cp, X)
            rT = _persp_resid_rows(*rows)
            r2 = rT[0] * rT[0] + rT[1] * rT[1]
            return psum_scalar(jnp.sum(o_w * _huber_cost(r2, huber_delta)))
        qs_o, ts_o = (o_sensor_q, o_sensor_t) if not optimize_rig \
            else (sq[o_sensor], st[o_sensor])

        def one(qf, tf, qs, ts, cpar, kind, Xp, uv, T):
            return _residual_one(qf, tf, qs, ts, cpar, kind, Xp, uv, T,
                                 jnp.zeros((25,), dtype=dtype))
        r = jax.vmap(one)(fq[o_frame], ft[o_frame], qs_o, ts_o,
                          cp[o_cam], o_kind, X[o_point], o_uv, o_T)
        r2 = jnp.sum(r * r, axis=-1)
        return psum_scalar(jnp.sum(o_w * _huber_cost(r2, huber_delta)))

    def lm_step(state):
        fq, ft, cp, X, sq, st, lam, cost, it, done, _, n_rej, \
            cg_total = state
        if fast_path and use_tables:
            # Pallas fused closed-form kernel over ALL camera kinds
            # (perspective / fisheye / FOV) — emits lane-major (2, O) /
            # (2*zdim, O) natively; optimize_rig adds the sensor-pose
            # columns in-kernel (no jacfwd fallback remains)
            from glomap_tpu.ops.pallas_kernels import (projection_resid_jac,
                                                       _on_tpu, LANES)
            s_q = sq if optimize_rig else sensor_quat
            s_t = st if optimize_rig else sensor_trans
            rows, ts3 = _persp_rows(fq, ft, s_q, s_t, cp, X)
            pad = (-num_obs) % LANES

            def padded(a):
                return jnp.pad(a, ((0, 0), (0, pad))) if pad else a

            rT, JT = projection_resid_jac(
                *[padded(a) for a in rows],
                tsrow=padded(ts3) if optimize_rig else None,
                interpret=not _on_tpu())
            rT = rT[:, :num_obs]
            JT = JT[:, :num_obs]
        elif fast_path and not optimize_rig:
            # no sensor index table available (legacy callers): per-obs
            # gathers via the wrapper
            from glomap_tpu.ops.pallas_kernels import (ba_resid_jac_gathered,
                                                       _on_tpu)
            qs_o, ts_o = gather_sensor(sq, st)
            r, J = ba_resid_jac_gathered(
                fq[o_frame], ft[o_frame], qs_o, ts_o,
                cp[o_cam], o_kind, X[o_point], o_uv,
                interpret=not _on_tpu())
            rT = r.T
            JT = J.reshape(num_obs, 50).T
        else:
            qs_o, ts_o = gather_sensor(sq, st)
            r, J = _resid_and_jac_v(fq[o_frame], ft[o_frame], qs_o,
                                    ts_o, cp[o_cam], o_kind,
                                    X[o_point], o_uv,
                                    jnp.broadcast_to(eye16,
                                                     (num_obs, 16, 16)),
                                    zdim)
            rT = r.T  # (2, O)
            JT = J.reshape(num_obs, 2 * zdim).T  # (2*zdim, O)

        w = o_w * _huber_weight(rT[0] * rT[0] + rT[1] * rT[1], huber_delta)
        sw = jnp.sqrt(w)
        # fold sqrt(w) into the rows once: all reductions below become
        # plain products of whitened rows. J3 is a free reshape VIEW of
        # the (2*zdim, O) row stack — per-block row groups are slices,
        # never per-row stack copies (profiled at ~1 ms each on TPU).
        J3 = (JT * sw).reshape(2, zdim, num_obs)
        pscale = 1.0 if optimize_points else 0.0
        Jf = J3[:, 0:6] * fm_o      # (2, 6, O), pose mask folded in
        Jp = J3[:, 6:9] * pscale    # (2, 3, O)
        Jc = J3[:, 9:25]            # (2, 16, O)
        if optimize_rig:
            Js = J3[:, 25:31] * sm_o
        # flat (2k, O) views feed the fused pair kernels (free reshapes)
        Jf2 = Jf.reshape(12, num_obs)
        Jp2 = Jp.reshape(6, num_obs)
        Jc2 = Jc.reshape(32, num_obs)
        if optimize_rig:
            Js2 = Js.reshape(12, num_obs)

        # per-camera tie matrices (constant): post-reduction application
        T_t = jnp.swapaxes(cam_T, -1, -2)  # (C, 16, 16)

        # The 16x16 camera-block builds (B_c and its Schur correction)
        # need all 256 row products; materializing a (256, O) stack costs
        # 1 GB per 1M observations. Above the budget, compute them as
        # per-camera masked (rows, O) x (O, rows) MXU dots instead — no
        # per-obs intermediates, exact same sums.
        big_cam_blocks = num_obs * 256 * 4 > (1 << 31)

        def cam_mask_row(c):
            return (o_cam == c).astype(dtype)

        def cam_block_16(A3, B3):
            """sum_o A3[r,i,o] B3[r,j,o] per camera -> (C, 16, 16)."""
            if not big_cam_blocks:
                return reduce_c(jnp.stack(rows_mm(A3, B3, 16, 16))
                                ).reshape(num_cams, 16, 16)
            Bf = B3.reshape(32, num_obs)

            def one(_, c):
                Af = (A3 * cam_mask_row(c)).reshape(32, num_obs)
                full = Af @ Bf.T  # (32, 32)
                return None, full[0:16, 0:16] + full[16:32, 16:32]

            # lax.scan (not a Python loop): compile size stays O(1) in the
            # number of cameras (city scenes can carry hundreds)
            _, outs = jax.lax.scan(one, None, jnp.arange(num_cams))
            return psum_scalar(outs)

        def tie_g(g_raw):  # (C, 16) -> tied
            return jnp.einsum("cij,cj->ci", T_t, g_raw)

        def tie_B(B_raw):  # (C, 16, 16) -> T^T B T
            return jnp.einsum("cij,cjk,ckl->cil", T_t, B_raw, cam_T)

        wrT = rT * sw  # whitened residual (2, O)

        g_f = rpairs_f(Jf2, wrT, jt_pairs(6))
        g_c = tie_g(rpairs_c(Jc2, wrT, jt_pairs(16)))
        g_p = rpairs_p(Jp2, wrT, jt_pairs(3))
        if optimize_rig:
            g_s = rpairs_s(Js2, wrT, jt_pairs(6))

        # block diagonals (whitened rows: no extra w factor); the fused
        # pair kernels form the Gram rows in VMEM — no (k*k, O) HBM stack
        B_f = rpairs_f(Jf2, Jf2, gram_pairs(6, 6)).reshape(
            num_frames, 6, 6)
        B_c = tie_B(cam_block_16(Jc, Jc))
        B_p = rpairs_p(Jp2, Jp2, gram_pairs(3, 3)).reshape(
            num_points, 3, 3)

        def damp(B, eye, floor):
            diag = jnp.diagonal(B, axis1=-2, axis2=-1)
            D = jnp.zeros_like(B) + \
                (lam * diag + floor)[..., None] * eye
            return B + D

        if optimize_rig:
            B_s = reduce_s(jnp.stack(rows_mm(Js, Js, 6, 6))).reshape(
                num_sensors, 6, 6)
            B_s_d = damp(B_s, eye6, 1e-8)
        B_f_d = damp(B_f, eye6, 1e-8)
        B_c_d = damp(B_c, eye16, 1e-6)
        B_p_d = damp(B_p, eye3, 1e-10)
        from glomap_tpu.ops.linear import inv3x3
        Bp_inv = inv3x3(B_p_d) if optimize_points else \
            jnp.broadcast_to(eye3, B_p_d.shape)

        # CG-loop operators stay on the COMPOSED ops (gather + einsum /
        # elementwise + rowsum): at CG scales the step is dispatch-latency
        # bound (BENCH_NOTES speed-of-light note) and an A/B on the v5e
        # measured the fused pair kernels ~6% slower here — each
        # pallas_call carries a window postlude that outweighs the one
        # fused elementwise op it saves, and XLA fuses the composition
        # fine. The fused kernels earn their keep on the once-per-LM
        # block builds below, where they delete whole (k*k, O) HBM
        # stacks.
        # Fused (frame (+) camera (+) sensor) matvec operators: at CG
        # scales the step is dispatch-latency bound, so the win is FEWER
        # index ops per matvec, not faster ones — one (F*S, 22/28)-column
        # table gather replaces the separate frame/camera/sensor gathers
        # and ONE fs reduction (+ tiny S-sized folds) replaces the three
        # segment reductions. exact=False: bf16 one-hot expansion — the
        # CG loop absorbs operator rounding (forcing tol 1e-2).
        if use_tables:
            Jfc = jnp.concatenate(
                [Jf, Jc] + ([Js] if optimize_rig else []), axis=1)
            kfc = 28 if optimize_rig else 22

            def J_apply(vf, vc, vs):
                vct = jnp.einsum("cij,cj->ci", cam_T, vc)  # tie first
                parts = [jnp.broadcast_to(vf[:, None, :],
                                          (num_frames, n_sens_t, 6)),
                         jnp.broadcast_to(vct[cam_of_s][None],
                                          (num_frames, n_sens_t, 16))]
                if optimize_rig:
                    parts.append(jnp.broadcast_to(
                        vs[None], (num_frames, n_sens_t, 6)))
                tabv = jnp.concatenate(parts, axis=2).reshape(
                    num_frames * n_sens_t, kfc)
                return app(Jfc, gather_fs(tabv, exact=False))

            def JT_scatter(y):
                acc = reduce_fs(jt(Jfc, y)).reshape(
                    num_frames, n_sens_t, kfc)
                out_f = jnp.sum(acc[:, :, 0:6], axis=1)
                c_parts = jnp.sum(acc[:, :, 6:22], axis=0)  # (S, 16)
                out_c = tie_g(jnp.zeros((num_cams, 16), dtype)
                              .at[cam_of_s].add(c_parts))
                out_s = jnp.sum(acc[:, :, 22:28], axis=0) \
                    if optimize_rig else None
                return out_f, out_c, out_s
        else:
            def J_apply(vf, vc, vs):
                vct = jnp.einsum("cij,cj->ci", cam_T, vc)  # tie first
                out = app(Jf, gather_f(vf, exact=False)) + \
                    app(Jc, gather_c(vct, exact=False))
                if optimize_rig:
                    out = out + app(Js, gather_s(vs, exact=False))
                return out

            def JT_scatter(y):
                out_f = reduce_f(jt(Jf, y))
                out_c = tie_g(reduce_c(jt(Jc, y)))
                out_s = reduce_s(jt(Js, y)) if optimize_rig else None
                return out_f, out_c, out_s

        def Hpc_apply(vf, vc, vs):
            """camera-side direction -> point-side (num_points, 3)"""
            return reduce_p(jt(Jp, J_apply(vf, vc, vs)))

        def Hcp_apply(vp):
            return JT_scatter(app(Jp, gather_p(vp, exact=False)))

        # Schur rhs: b = -g_cam - H_cp Bp_inv (-g_p)
        z_p = jnp.einsum("tij,tj->ti", Bp_inv, -g_p)
        hf, hc, hs = Hcp_apply(z_p)
        b_f = -g_f - hf
        b_c = -g_c - hc
        b_s = (-g_s - hs) if optimize_rig else \
            jnp.zeros((num_sensors, 6), dtype)

        nf6 = num_frames * 6
        nc16 = num_cams * 16

        def pack(vf, vc, vs):
            parts = [vf.reshape(-1), vc.reshape(-1)]
            if optimize_rig:
                parts.append(vs.reshape(-1))
            return jnp.concatenate(parts)

        def unpack(v):
            vf = v[:nf6].reshape(num_frames, 6)
            vc = v[nf6:nf6 + nc16].reshape(num_cams, 16)
            vs = v[nf6 + nc16:].reshape(num_sensors, 6) if optimize_rig \
                else jnp.zeros((num_sensors, 6), dtype)
            return vf, vc, vs

        # damping is diagonal-only (damp() adds (lam*diag + floor)*eye),
        # so the matvec applies it as an elementwise product — no dense
        # (n, 6, 6) temporaries inside the CG loop
        d_f = lam * jnp.diagonal(B_f, axis1=-2, axis2=-1) + 1e-8
        d_c = lam * jnp.diagonal(B_c, axis1=-2, axis2=-1) + 1e-6
        if optimize_rig:
            d_s = lam * jnp.diagonal(B_s, axis1=-2, axis2=-1) + 1e-8

        def schur_mv(v):
            vf, vc, vs = unpack(v)
            # S v = J^T (y - J_p Bp_inv J_p^T y) + D v with y = J v:
            # JT_scatter is linear, so the H_cc term and the -H_cp Bp_inv
            # H_pc correction share ONE fs-table reduction on (y - y2)
            # instead of two (the step is dispatch-latency bound —
            # BENCH_NOTES; this deletes the second-hottest op per matvec).
            # y2 reuses y = J v directly (the Pallas segment kernels are
            # custom calls XLA will not CSE, so the second J_apply the
            # naive formula implies would run for real).
            y = J_apply(vf, vc, vs)
            zp = jnp.einsum("tij,tj->ti", Bp_inv, reduce_p(jt(Jp, y)))
            y2 = app(Jp, gather_p(zp, exact=False))
            out_f, out_c, out_s = JT_scatter(y - y2)
            # damping contribution (block diagonals only)
            out_f = out_f + d_f * vf
            out_c = out_c + d_c * vc
            if optimize_rig:
                return pack(out_f, out_c, out_s + d_s * vs)
            return pack(out_f, out_c, None)

        # SCHUR_JACOBI preconditioner (Ceres's): block diagonal of the
        # Schur complement itself, S_ff = B_f - sum_o C_o Bp_inv C_o^T
        # (exact when each (frame, point) pair has one observation, the
        # typical case) — cuts PCG iterations several-fold vs plain
        # block-Jacobi on H_cc. Per-obs Bp_inv arrives lane-major via a
        # one-hot / sorted-window matmul gather (9, O).
        Bpi_o = gather_p(Bp_inv.reshape(num_points, 9))  # (9, O)

        def schur_corr(Jx, k, rpairs_x):
            """sum_o C_o Bp_inv C_o^T for C_o = J_x^T J_p per obs:
            (n, k*k). The (3k, O) C/D stacks materialize once per LM
            iteration; the (k*k, O) product never does — the fused pair
            kernel contracts D against C in VMEM."""
            C = jnp.stack(rows_mm(Jx, Jp, k, 3))  # (3k, O)
            # D[i*3+m] = sum_j C[i*3+j] Bpi[j*3+m]
            D = jnp.stack([sum(C[i * 3 + j] * Bpi_o[j * 3 + m]
                               for j in range(3))
                           for i in range(k) for m in range(3)])
            return rpairs_x(D, C, corr_pairs(k))

        def schur_corr_cam():
            """The (16, 16) correction per camera without the (256, O)
            stack: partial-trace of per-camera (48, 48) dots."""
            if not big_cam_blocks:
                return schur_corr(Jc, 16, rpairs_c).reshape(
                    num_cams, 16, 16)
            C = jnp.stack(rows_mm(Jc, Jp, 16, 3))  # (48, O)
            D = jnp.stack([sum(C[i * 3 + j] * Bpi_o[j * 3 + m]
                               for j in range(3))
                           for i in range(16) for m in range(3)])

            def one(_, c):
                EF = (D * cam_mask_row(c)) @ C.T  # (48, 48)
                return None, jnp.einsum("imlm->il",
                                        EF.reshape(16, 3, 16, 3))

            _, outs = jax.lax.scan(one, None, jnp.arange(num_cams))
            return psum_scalar(outs)

        S_f = B_f_d - schur_corr(Jf, 6, rpairs_f).reshape(num_frames, 6, 6)
        S_c = B_c_d - tie_B(schur_corr_cam())
        Bf_inv = jnp.linalg.inv(S_f)
        Bc_inv = jnp.linalg.inv(S_c)
        if optimize_rig:
            S_s = B_s_d - schur_corr(Js, 6, rpairs_s).reshape(
                num_sensors, 6, 6)
            Bs_inv = jnp.linalg.inv(S_s)
        else:
            Bs_inv = None

        def precond(v):
            vf, vc, vs = unpack(v)
            pf = jnp.einsum("fij,fj->fi", Bf_inv, vf)
            pc = jnp.einsum("cij,cj->ci", Bc_inv, vc)
            ps = jnp.einsum("sij,sj->si", Bs_inv, vs) if optimize_rig \
                else None
            return pack(pf, pc, ps)

        # Inexact-Newton forcing: cg_tol relative residual (default 1e-2,
        # tighter than Ceres's ITERATIVE_SCHUR default eta=1e-1,
        # solver.h) — the LM outer loop absorbs the remaining
        # linear-solve error, and the early exit cuts the latency-bound
        # small-op chain that dominates the step at moderate scales
        # (BENCH_NOTES speed-of-light note).
        sol, cg_it, _ = cg_generic(schur_mv, pack(b_f, b_c, b_s),
                                   max_iters=cg_iters, tol=cg_tol,
                                   precond=precond, return_info=True)
        dvf, dvc, dvs = unpack(sol)
        dvf = dvf * frame_mask
        if optimize_rig:
            dvs = dvs * sensor_mask
        # back-substitute points
        dX = jnp.einsum("tij,tj->ti", Bp_inv,
                        -g_p - Hpc_apply(dvf, dvc, dvs)) if optimize_points \
            else jnp.zeros_like(X)

        fq_new = rotm.quat_normalize(
            rotm.quat_mul(fq, rotm.so3_exp_quat(dvf[:, 0:3])))
        ft_new = ft + dvf[:, 3:6]
        cp_new = cp + jnp.einsum("cij,cj->ci", cam_T, dvc)
        X_new = X + dX
        if optimize_rig:
            sq_new = rotm.quat_normalize(
                rotm.quat_mul(sq, rotm.so3_exp_quat(dvs[:, 0:3])))
            st_new = st + dvs[:, 3:6]
        else:
            sq_new, st_new = sq, st

        new_cost = compute_cost(fq_new, ft_new, cp_new, X_new, sq_new,
                                st_new)
        accept = new_cost < cost
        fq = jnp.where(accept, fq_new, fq)
        ft = jnp.where(accept, ft_new, ft)
        cp = jnp.where(accept, cp_new, cp)
        X = jnp.where(accept, X_new, X)
        sq = jnp.where(accept, sq_new, sq)
        st = jnp.where(accept, st_new, st)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                        jnp.minimum(lam * 4.0, 1e8))
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        # termination: small relative decrease on an accepted step
        # (Ceres function_tolerance), OR a run of consecutive rejections
        # (the analog of Ceres's minimum-trust-region-radius exit: after
        # 8 straight rejections lam grew 4^8 ~ 65k-fold without finding
        # a descent step — the solve is at its floor; without this exit
        # a stalled solve spins to max_iters, measured 200 iters / 2.3 s
        # per stage-6 BA call on the e2e bench vs ~30 needed)
        n_rej = jnp.where(accept, 0, n_rej + 1)
        done = (accept & (rel < function_tol)) | (n_rej >= max_rejections)
        cost = jnp.where(accept, new_cost, cost)
        return (fq, ft, cp, X, sq, st, lam, cost, it + 1, done, accept,
                n_rej, cg_total + cg_it)

    def cond(state):
        return (state[8] < max_iters) & ~state[9]

    if sensor_quat is None:
        sensor_quat = jnp.zeros((max(num_sensors, 1), 4),
                                dtype).at[:, 0].set(1.0)
        sensor_trans = jnp.zeros((max(num_sensors, 1), 3), dtype)
    cost0 = compute_cost(frame_quat, frame_trans, cam_params, points,
                         sensor_quat, sensor_trans)
    lam_init = jnp.asarray(1e-4, dtype) if lam0 is None \
        else jnp.asarray(lam0, dtype)
    state = (frame_quat, frame_trans, cam_params, points,
             sensor_quat, sensor_trans,
             lam_init, cost0, 0, jnp.asarray(False),
             jnp.asarray(True), jnp.asarray(0), jnp.asarray(0))
    fq, ft, cp, X, sq, st, lam, cost, it, done, _, _, cg_total = \
        jax.lax.while_loop(cond, lm_step, state)
    return fq, ft, cp, X, cost, it, sq, st, cg_total, lam, done


def ba_fast_path_ok(scene: Scene) -> bool:
    """The Pallas closed-form kernel covers every canonical camera kind
    (0 perspective, 1 fisheye/equidistant, 2 FOV) with exact Jacobians —
    i.e. all 11+ COLMAP models after canonicalization."""
    return bool(np.all(np.isin(scene.cam_kind, (0, 1, 2))))


def solve_bundle_adjustment(scene: Scene, tracks: Tracks,
                            opts: BundleAdjusterOptions | None = None,
                            dtype=None, mesh=None) -> bool:
    """Run global BA; updates scene poses/intrinsics and track points.

    Counterpart of BundleAdjuster::Solve (bundle_adjustment.cc:11-106).

    mesh: optional jax.sharding.Mesh — routes to the partition-aware
    distributed solver (parallel/partitioned_ba): points and observations
    sharded by graph part under shard_map, frame/camera blocks replicated,
    camera-side reductions psum'd over ICI; the Pallas lane-major kernels
    run locally per device, so the fast path survives distribution.
    """
    opts = opts or BundleAdjusterOptions()
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    if tracks.num_obs == 0:
        return False
    if mesh is not None:
        from glomap_tpu.parallel.partitioned_ba import solve_ba_partitioned
        cost, _ = solve_ba_partitioned(scene, tracks, mesh, opts, dtype)
        return bool(np.isfinite(cost))

    import time as _time
    _t0 = _time.monotonic()
    lengths = np.bincount(tracks.obs_track[tracks.obs_valid],
                          minlength=tracks.num_tracks)
    track_ok = tracks.valid & (lengths >= opts.min_num_view_per_track)
    reg = scene.frame_registered[scene.image_frame]
    ob_ok = tracks.obs_valid & track_ok[tracks.obs_track] & \
        reg[tracks.obs_image]
    if not ob_ok.any():
        return False

    o_img = tracks.obs_image[ob_ok]
    o_frame = scene.image_frame[o_img].astype(np.int32)
    o_cam = scene.image_camera[o_img].astype(np.int32)
    o_point = tracks.obs_track[ob_ok].astype(np.int32)
    o_sensor = scene.image_sensor[o_img].astype(np.int32)
    kp = scene.kp_offset[o_img] + tracks.obs_feature[ob_ok]

    # locality ordering: renumber tracks by mean frame, sort obs by the
    # new track id — bounds the per-block id windows of BOTH hot index
    # axes so the solver's Pallas windowed kernels apply (see
    # order_obs_for_locality)
    obs_perm, point_perm, new_of_old = order_obs_for_locality(
        o_frame, o_point, tracks.num_tracks)
    o_frame = o_frame[obs_perm]
    o_cam = o_cam[obs_perm]
    o_point = new_of_old[o_point[obs_perm]].astype(np.int32)
    o_sensor = o_sensor[obs_perm]
    o_img = o_img[obs_perm]
    kp = kp[obs_perm]

    # bucket-pad the obs axis (and the point count) so repeated BA calls
    # across filter rounds reuse the compiled solver (padded rows carry
    # zero weight -> exact no-ops). Pads repeat the LAST id so the tail
    # block's window stays bounded.
    from glomap_tpu.utils.padding import bucket_size, pad_axis0
    n_obs = len(o_img)
    n_obs_pad = bucket_size(n_obs)
    o_w_np = pad_axis0(np.ones(n_obs), n_obs_pad)
    o_point = pad_axis0(o_point, n_obs_pad, fill=int(o_point[-1]))
    o_frame = pad_axis0(o_frame, n_obs_pad, fill=int(o_frame[-1]))
    o_cam = pad_axis0(o_cam, n_obs_pad)
    point_width = _axis_window(o_point)
    frame_width = _axis_window(o_frame)
    o_sensor = pad_axis0(o_sensor, n_obs_pad)
    o_sq = pad_axis0(scene.sensor_quat[scene.image_sensor[o_img]], n_obs_pad)
    o_sq[n_obs:, 0] = 1.0
    o_st = pad_axis0(scene.sensor_trans[scene.image_sensor[o_img]], n_obs_pad)
    o_kind_np = pad_axis0(scene.cam_kind[o_cam[:n_obs]], n_obs_pad)
    o_uv_np = pad_axis0(scene.kp_xy[kp], n_obs_pad)
    num_points_pad = bucket_size(tracks.num_tracks, 64)
    points_np = pad_axis0(tracks.xyz[point_perm], num_points_pad)

    # pose mask: gauge-fix the first registered frame (reference counter==0
    # case); apply optimize_rotations / optimize_translation flags
    F = scene.num_frames
    frame_mask = np.ones((F, 6))
    if not opts.optimize_rotations:
        frame_mask[:, 0:3] = 0.0
    if not opts.optimize_translation:
        frame_mask[:, 3:6] = 0.0
    reg_frames = np.nonzero(scene.frame_registered)[0]
    if len(reg_frames):
        frame_mask[reg_frames[0], :] = 0.0
    frame_mask[~scene.frame_registered, :] = 0.0

    cam_T = np.stack([
        intrinsic_tie_matrix(int(m), opts.optimize_intrinsics,
                             opts.optimize_principal_point)
        for m in scene.cam_model_id])

    fast_path = ba_fast_path_ok(scene)

    # sensor-pose optimization (reference optimize_rig_poses): only
    # non-reference sensors move
    num_sensors = len(scene.sensor_quat)
    sensor_mask = np.zeros((num_sensors, 6))
    if opts.optimize_rig_poses:
        sensor_mask[~scene.sensor_is_ref, :] = 1.0

    _t1 = _time.monotonic()
    args_pos = (
        jnp.asarray(scene.frame_quat, dtype=dtype),
        jnp.asarray(scene.frame_trans, dtype=dtype),
        jnp.asarray(scene.cam_params, dtype=dtype),
        jnp.asarray(points_np, dtype=dtype),
        jnp.asarray(o_frame), jnp.asarray(o_cam),
        jnp.asarray(o_point),
        jnp.asarray(o_sq, dtype=dtype),
        jnp.asarray(o_st, dtype=dtype),
        jnp.asarray(o_kind_np),
        jnp.asarray(o_uv_np, dtype=dtype),
        jnp.asarray(cam_T, dtype=dtype),
        jnp.asarray(o_w_np, dtype=dtype),
        jnp.asarray(frame_mask, dtype=dtype))
    kw = dict(
        fast_path=fast_path,
        o_sensor=jnp.asarray(o_sensor),
        sensor_quat=jnp.asarray(scene.sensor_quat, dtype=dtype),
        sensor_trans=jnp.asarray(scene.sensor_trans, dtype=dtype),
        sensor_mask=jnp.asarray(sensor_mask, dtype=dtype),
        num_sensors=num_sensors,
        optimize_rig=bool(opts.optimize_rig_poses),
        point_width=point_width, frame_width=frame_width,
        cam_kind=jnp.asarray(scene.cam_kind.astype(np.int32)),
        cg_tol=float(opts.cg_relative_tolerance))
    stat = (scene.num_frames, scene.num_cameras, num_points_pad,
            float(opts.thres_loss_function),
            float(opts.function_tolerance))
    max_iters = int(opts.max_num_iterations)
    # bounded-duration device calls: the tunneled chip kills single XLA
    # executions >~60-90 s (measured round 5, GP at 2.4M obs); the
    # conservative per-LM-iteration model is obs / 1e7 s (the measured
    # rate at 1-10M obs). Small problems take the single-call path with
    # the exact pre-segmentation graph.
    seg = max(5, int(_SEGMENT_TARGET_S * _BA_OBS_ITERS_PER_S
                     / max(n_obs, 1)))
    if seg >= max_iters:
        fq, ft, cp, X, cost, it, sq, st, cg_total, _lam, _done = \
            _solve_ba(*args_pos, *stat, max_iters,
                      int(opts.cg_max_iterations),
                      bool(opts.optimize_points), **kw)
        it = int(it)
        cg_total = int(cg_total)
    else:
        lam = jnp.asarray(1e-4, dtype)
        state = args_pos[:4] + (kw["sensor_quat"], kw["sensor_trans"])
        it = 0
        cg_total = 0
        while True:
            fq, ft, cp, X, cost, s_it, sq, st, s_cg, lam, done = \
                _solve_ba(state[0], state[1], state[2], state[3],
                          *args_pos[4:], *stat, seg,
                          int(opts.cg_max_iterations),
                          bool(opts.optimize_points), lam0=lam,
                          **{**kw, "sensor_quat": state[4],
                             "sensor_trans": state[5]})
            it += int(s_it)
            cg_total += int(s_cg)
            state = (fq, ft, cp, X, sq, st)
            if bool(done) or int(s_it) < seg or it >= max_iters:
                break

    fq = np.asarray(fq, dtype=np.float64)
    ft = np.asarray(ft, dtype=np.float64)
    cp = np.asarray(cp, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    import logging as _logging
    _logging.getLogger(__name__).info(
        "BA solve: %d LM iters, cost %.3e, host prep %.2fs, "
        "solve+pull %.2fs (%d obs, %d CG iters total, %.1f/LM, cap %d)",
        it, float(cost), _t1 - _t0, _time.monotonic() - _t1, n_obs,
        cg_total, float(cg_total) / max(it, 1),
        int(opts.cg_max_iterations))
    if not (np.all(np.isfinite(fq)) and np.all(np.isfinite(ft)) and
            np.all(np.isfinite(cp)) and np.all(np.isfinite(X))):
        return False
    scene.frame_quat[:] = fq
    scene.frame_trans[:] = ft
    scene.cam_params[:] = cp
    if opts.optimize_rig_poses:
        scene.sensor_quat[:] = np.asarray(sq, dtype=np.float64)
        scene.sensor_trans[:] = np.asarray(st, dtype=np.float64)
    if opts.optimize_points:
        tracks.xyz[:] = X[new_of_old]  # undo the locality renumbering
    return True
