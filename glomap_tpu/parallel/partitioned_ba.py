"""Partition-aware distributed bundle adjustment.

The north-star distributed design (SURVEY.md §2.3, BASELINE.json): the
view graph is partitioned into balanced parts by the spectral partitioner
(parallel/partitioner.py, the METIS replacement), 3D points are assigned
to the part where most of their observations live, and every observation
is CO-LOCATED WITH ITS POINT'S SHARD. Under `shard_map` over the device
mesh this gives:

  * the point parameter block — the dominant state at city scale — is
    SHARDED: each device holds only its part's points (HBM footprint
    scales ~1/P instead of replicating all points as the round-1
    obs-sharded path did);
  * every point-axis reduction (g_p, B_p blocks, Schur back-substitution)
    is LOCAL to a device — no collective at all, because a point's
    observations never straddle parts by construction;
  * only the reduced camera-side system (6 per frame + 16 per camera
    gradients/blocks and the CG matvec partials) crosses devices, as one
    `psum` over ICI per reduction — "Schur complement reduces point
    blocks locally, camera reduced system assembled with psum"
    (SURVEY.md §2.3:174-182);
  * the Pallas lane-major kernels (perspective_resid_jac and the
    sorted-window segment ops) run UNMODIFIED per device: inside
    shard_map every pallas_call sees local shapes, so the single-chip
    fast path survives distribution (round-1 weakness #1).

The partition quality drives the frame-axis window bound: points are
ordered by mean observing frame within each part, so the per-part obs
stream keeps the same capture locality the single-chip solver exploits.

Reference counterpart: none — the reference (GLOMAP) is single-process;
this layer replaces its scale-by-subsampling strategy
(track_establishment.cc:153-225) with real partitioning.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from glomap_tpu.config import BundleAdjusterOptions
from glomap_tpu.scene.arrays import Scene, Tracks

logger = logging.getLogger(__name__)

_MAX_COVIS_TRACKS = 200_000  # subsample tracks for the partition graph


def obs_part_layout(obs_part: np.ndarray, num_parts: int,
                    second_key: np.ndarray | None = None):
    """Per-part layout of a partitioned obs stream sorted by
    (part, second_key): returns (order, per_part, offsets, Omax) with
    Omax bucket-padded so repeat solves hit the jit cache. second_key is
    typically the local point id — the sorted-window kernels need it."""
    from glomap_tpu.utils.padding import bucket_size
    if second_key is not None:
        order = np.lexsort((second_key, obs_part))
    else:
        order = np.argsort(obs_part, kind="stable")
    per_part = np.bincount(obs_part, minlength=num_parts)
    Omax = bucket_size(int(per_part.max()) if len(per_part) else 1)
    off = np.concatenate([[0], np.cumsum(per_part)])
    return order, per_part, off, Omax


def scatter_to_parts(a: np.ndarray, order, per_part, off, Omax,
                     fill=0, tail_repeat: bool = False) -> np.ndarray:
    """(O_total, ...) -> (P, Omax, ...) per-part padded host scatter.
    tail_repeat pads each part with its last row (keeps sorted id axes
    sorted for the Pallas windowed kernels)."""
    Pn = len(per_part)
    out = np.full((Pn, Omax) + a.shape[1:], fill, dtype=a.dtype)
    src = a[order]
    for p in range(Pn):
        n = per_part[p]
        out[p, :n] = src[off[p]:off[p + 1]]
        if tail_repeat and n:
            out[p, n:] = src[off[p + 1] - 1]
    return out


@dataclass
class PointPartition:
    """Host-side partition plan mapping tracks/obs to mesh parts."""
    num_parts: int
    frame_part: np.ndarray    # (F,) part of each frame
    point_ids: np.ndarray     # (n_included,) global track ids
    point_part: np.ndarray    # (n_included,) part per included track
    point_local: np.ndarray   # (n_included,) slot within the part
    points_per_part: int      # Tmax (padded)
    cut_fraction: float


def partition_points(scene: Scene, tracks: Tracks, num_parts: int,
                     o_point: np.ndarray, o_frame: np.ndarray
                     ) -> PointPartition:
    """Assign frames to parts (spectral bisection of the covisibility
    graph) and each observed track to the part holding the majority of
    its observations."""
    from glomap_tpu.parallel.partitioner import partition_frames, Partition
    from glomap_tpu.utils.padding import bucket_size

    T = tracks.num_tracks
    if num_parts > 1 and scene.num_frames > num_parts:
        sub = tracks
        if T > _MAX_COVIS_TRACKS:
            # subsample tracks for the partition graph (quality-neutral:
            # covisibility structure is heavily redundant)
            keep = np.zeros(T, dtype=bool)
            keep[np.linspace(0, T - 1, _MAX_COVIS_TRACKS).astype(np.int64)] = True
            sub = tracks.copy()
            sub.valid = sub.valid & keep
        part = partition_frames(scene, sub, num_parts)
    else:
        part = Partition(
            frame_part=(np.arange(scene.num_frames) * num_parts
                        // max(scene.num_frames, 1)).astype(np.int64),
            num_parts=num_parts, edge_cut=0.0, total_weight=1.0,
            sizes=np.bincount(
                np.arange(scene.num_frames) * num_parts
                // max(scene.num_frames, 1), minlength=num_parts))

    included = np.zeros(T, dtype=bool)
    included[o_point] = True
    point_ids = np.nonzero(included)[0]

    # majority part per point over its observations
    obs_part = part.frame_part[o_frame].astype(np.int64)
    pk = o_point.astype(np.int64) * num_parts + obs_part
    uk, cnt = np.unique(pk, return_counts=True)
    upt = uk // num_parts
    upp = uk % num_parts
    srt = np.lexsort((cnt, upt))
    last = np.ones(len(srt), dtype=bool)
    if len(srt) > 1:
        last[:-1] = upt[srt][1:] != upt[srt][:-1]
    best_pt = upt[srt][last]
    best_pp = upp[srt][last]
    point_part_full = np.zeros(T, dtype=np.int64)
    point_part_full[best_pt] = best_pp
    point_part = point_part_full[point_ids]

    # local slot: order points by mean observing frame within each part
    # (keeps the capture locality the sorted-window kernels exploit)
    sums = np.bincount(o_point, weights=o_frame.astype(np.float64),
                       minlength=T)
    cnts = np.maximum(np.bincount(o_point, minlength=T), 1)
    mean_frame = (sums / cnts)[point_ids]
    order = np.lexsort((mean_frame, point_part))
    counts = np.bincount(point_part, minlength=num_parts)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    point_local = np.empty(len(point_ids), dtype=np.int64)
    point_local[order] = np.arange(len(point_ids)) - \
        offsets[point_part[order]]

    points_per_part = bucket_size(int(counts.max()) if len(counts) else 1,
                                  64)
    return PointPartition(
        num_parts=num_parts, frame_part=part.frame_part,
        point_ids=point_ids, point_part=point_part,
        point_local=point_local, points_per_part=points_per_part,
        cut_fraction=part.cut_fraction)


def build_partitioned_ba_inputs(scene: Scene, tracks: Tracks, num_parts: int,
                                opts: BundleAdjusterOptions | None = None,
                                dtype=jnp.float32):
    """Host-side assembly of per-part padded BA arrays.

    Returns (params, obs_parts, statics, plan) where obs_parts arrays
    carry a leading (num_parts,) axis to be sharded over the mesh, and
    plan maps the sharded point block back to global track ids.
    """
    from glomap_tpu.estimators.bundle_adjustment import intrinsic_tie_matrix
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    from glomap_tpu.utils.padding import bucket_size

    opts = opts or BundleAdjusterOptions()
    lengths = np.bincount(tracks.obs_track[tracks.obs_valid],
                          minlength=tracks.num_tracks)
    track_ok = tracks.valid & (lengths >= opts.min_num_view_per_track)
    reg = scene.frame_registered[scene.image_frame]
    ob_ok = tracks.obs_valid & track_ok[tracks.obs_track] & \
        reg[tracks.obs_image]
    o_img = tracks.obs_image[ob_ok]
    o_frame = scene.image_frame[o_img].astype(np.int32)
    o_cam = scene.image_camera[o_img].astype(np.int32)
    o_point = tracks.obs_track[ob_ok].astype(np.int32)
    o_sensor = scene.image_sensor[o_img].astype(np.int32)
    kp = scene.kp_offset[o_img] + tracks.obs_feature[ob_ok]
    uv = scene.kp_xy[kp]

    plan = partition_points(scene, tracks, num_parts, o_point, o_frame)
    Tmax = plan.points_per_part
    Pn = plan.num_parts

    # global->local point map for observed tracks
    loc_of = np.zeros(tracks.num_tracks, dtype=np.int64)
    part_of = np.zeros(tracks.num_tracks, dtype=np.int64)
    loc_of[plan.point_ids] = plan.point_local
    part_of[plan.point_ids] = plan.point_part

    obs_part = part_of[o_point]
    o_local = loc_of[o_point].astype(np.int32)
    order, per_part, off, Omax = obs_part_layout(obs_part, Pn,
                                                 second_key=o_local)

    def scatter(a, fill=0, tail_repeat=False):
        return scatter_to_parts(a, order, per_part, off, Omax, fill,
                                tail_repeat)

    obs = dict(
        o_frame=scatter(o_frame, tail_repeat=True),
        o_cam=scatter(o_cam),
        o_point=scatter(o_local, tail_repeat=True),
        o_sensor=scatter(o_sensor),
        o_kind=scatter(scene.cam_kind[o_cam]),
        o_uv=scatter(np.asarray(uv, np.float64)).astype(dtype),
        o_w=scatter(np.ones(len(o_img))).astype(dtype),
        o_sensor_q=scatter(
            np.asarray(scene.sensor_quat[o_sensor])).astype(dtype),
        o_sensor_t=scatter(
            np.asarray(scene.sensor_trans[o_sensor])).astype(dtype),
    )
    # zero-weight pad rows; identity pad quaternions
    pad_mask = np.arange(Omax)[None, :] >= per_part[:, None]
    obs["o_w"][pad_mask] = 0.0
    obs["o_sensor_q"][pad_mask] = np.array([1, 0, 0, 0], dtype)

    # per-part sharded point table
    points = np.zeros((Pn, Tmax, 3))
    points[plan.point_part, plan.point_local] = tracks.xyz[plan.point_ids]
    obs["points"] = points.astype(dtype)

    # static windows for the sorted-window kernels: max over parts
    pw = max(block_width_for_sorted(obs["o_point"][p]) for p in range(Pn))
    fw = max(block_width_for_sorted(obs["o_frame"][p]) for p in range(Pn))
    point_width = pw if pw <= 4096 else 0
    frame_width = fw if fw <= 4096 else 0

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
    num_sensors = len(scene.sensor_quat)
    sensor_mask = np.zeros((num_sensors, 6))
    if opts.optimize_rig_poses:
        sensor_mask[~scene.sensor_is_ref, :] = 1.0

    params = dict(
        frame_quat=np.asarray(scene.frame_quat).astype(dtype),
        frame_trans=np.asarray(scene.frame_trans).astype(dtype),
        cam_params=np.asarray(scene.cam_params).astype(dtype),
        cam_kind=np.asarray(scene.cam_kind, np.int32),
        cam_T=cam_T.astype(dtype),
        frame_mask=frame_mask.astype(dtype),
        sensor_quat=np.asarray(scene.sensor_quat).astype(dtype),
        sensor_trans=np.asarray(scene.sensor_trans).astype(dtype),
        sensor_mask=sensor_mask.astype(dtype),
    )
    from glomap_tpu.estimators.bundle_adjustment import ba_fast_path_ok
    statics = dict(
        num_frames=F, num_cams=scene.num_cameras, num_points=Tmax,
        huber_delta=float(opts.thres_loss_function),
        function_tol=float(opts.function_tolerance),
        max_iters=int(opts.max_num_iterations), cg_iters=30,
        cg_tol=float(opts.cg_relative_tolerance),
        optimize_points=bool(opts.optimize_points),
        optimize_rig=bool(opts.optimize_rig_poses),
        num_sensors=num_sensors,
        point_width=point_width, frame_width=frame_width,
        fast_path=ba_fast_path_ok(scene),
    )
    return params, obs, statics, plan


def _comm_volume_bytes(statics, itemsize: int) -> int:
    """Per-LM-iteration psum payload on the camera-side reduced system."""
    F, C, S = (statics["num_frames"], statics["num_cams"],
               statics["num_sensors"])
    blk = 6 * F + 16 * C + (6 * S if statics["optimize_rig"] else 0)
    grads = blk                      # g_f / g_c (+ g_s)
    diags = 36 * F + 256 * C + (36 * S if statics["optimize_rig"] else 0)
    schur = diags                    # Schur-correction blocks
    per_matvec = blk                 # JT_scatter partials inside CG
    cost = 2                         # cost scalars (init + accept check)
    n = grads + diags + schur + cost + (statics["cg_iters"] + 2) * per_matvec
    return n * itemsize


@lru_cache(maxsize=32)
def _partitioned_ba_fn(mesh, axis: str, statics_items: tuple):
    """Memoized shard_map-wrapped solver: rebuilding the closure per call
    would miss jax's dispatch cache and pay the full (remote) compile on
    EVERY solve — the staged-BA loop calls this 6+ times per mapper run.
    Keyed on the (hashable) mesh + static solver config."""
    from glomap_tpu.estimators.bundle_adjustment import _solve_ba
    stat = dict(statics_items)

    def body(points, o_frame, o_cam, o_point, o_sensor, o_kind, o_uv, o_w,
             o_sq, o_st, fq, ft, cp, cam_kind, cam_T, frame_mask, sq, st,
             sm, cam_of_sensor):
        fqo, fto, cpo, X, cost, it, sqo, sto, _cg, _lam, _done = \
            _solve_ba(
            fq, ft, cp, points[0],
            o_frame[0], o_cam[0], o_point[0], o_sq[0], o_st[0],
            o_kind[0], o_uv[0], cam_T, o_w[0], frame_mask,
            o_sensor=o_sensor[0], sensor_quat=sq, sensor_trans=st,
            sensor_mask=sm, cam_kind=cam_kind, mesh_axis=axis,
            cam_of_sensor=cam_of_sensor, **stat)
        return fqo, fto, cpo, X[None], cost, it, sqo, sto

    sharded = P(axis)
    repl = P()
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(sharded,) * 10 + (repl,) * 10,
        out_specs=(repl, repl, repl, sharded, repl, repl, repl, repl),
        check_vma=False))


def solve_ba_partitioned(scene: Scene, tracks: Tracks, mesh,
                         opts: BundleAdjusterOptions | None = None,
                         dtype=jnp.float32, return_arrays: bool = False):
    """Run partition-sharded global BA over `mesh`; writes results back.

    Returns (final_cost, lm_iters). The mesh must be 1-D; its device
    count sets the partition count.
    """
    from glomap_tpu.estimators.bundle_adjustment import _solve_ba

    opts = opts or BundleAdjusterOptions()
    if tracks.num_obs == 0:
        return float("nan"), 0
    axis = mesh.axis_names[0]
    n_parts = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    params, obs, statics, plan = build_partitioned_ba_inputs(
        scene, tracks, n_parts, opts, dtype)
    logger.info(
        "partitioned BA: %d parts, %d pts/part, %d obs/part, cut=%.2f%%, "
        "psum volume ~%.2f MB/LM-iter",
        n_parts, statics["num_points"], obs["o_w"].shape[1],
        100.0 * plan.cut_fraction,
        _comm_volume_bytes(statics, np.dtype(dtype).itemsize) / 1e6)

    fn = _partitioned_ba_fn(mesh, axis,
                            tuple(sorted(statics.items())))
    sharded = P(axis)
    repl = P()

    # multi-process safe upload: each host materializes only its shards
    from glomap_tpu.parallel.multihost import fetch_global, put_global
    _ps = lambda a: put_global(np.asarray(a), mesh, sharded)
    _pr = lambda a: put_global(np.asarray(a), mesh, repl)

    fq, ft, cp, X, cost, it, sq, st = fn(
        _ps(obs["points"]), _ps(obs["o_frame"]),
        _ps(obs["o_cam"]), _ps(obs["o_point"]),
        _ps(obs["o_sensor"]), _ps(obs["o_kind"]),
        _ps(obs["o_uv"]), _ps(obs["o_w"]),
        _ps(obs["o_sensor_q"]), _ps(obs["o_sensor_t"]),
        _pr(params["frame_quat"]), _pr(params["frame_trans"]),
        _pr(params["cam_params"]), _pr(params["cam_kind"]),
        _pr(params["cam_T"]),
        _pr(params["frame_mask"]), _pr(params["sensor_quat"]),
        _pr(params["sensor_trans"]), _pr(params["sensor_mask"]),
        # replicated host-derived sensor->camera map: local obs shards
        # may not cover every sensor (see _solve_ba cam_of_sensor)
        _pr(scene.sensor_camera.astype(np.int32)))

    if return_arrays:
        return (fq, ft, cp, X, cost, it, sq, st), plan

    fq_np = np.asarray(fq, np.float64)
    ft_np = np.asarray(ft, np.float64)
    cp_np = np.asarray(cp, np.float64)
    X_np = fetch_global(X).astype(np.float64)
    if not (np.all(np.isfinite(fq_np)) and np.all(np.isfinite(ft_np))
            and np.all(np.isfinite(cp_np)) and np.all(np.isfinite(X_np))):
        return float("nan"), 0
    scene.frame_quat[:] = fq_np
    scene.frame_trans[:] = ft_np
    scene.cam_params[:] = cp_np
    if opts.optimize_rig_poses:
        scene.sensor_quat[:] = np.asarray(sq, np.float64)
        scene.sensor_trans[:] = np.asarray(st, np.float64)
    if opts.optimize_points:
        tracks.xyz[plan.point_ids] = X_np[plan.point_part, plan.point_local]
    return float(cost), int(it)
