"""LEGACY replicated-parameter distributed BA (round-1 design).

SUPERSEDED by parallel/partitioned_ba (partition-aware: points and
observations physically sharded by spectral graph part under shard_map,
7.4x lower HBM at the 1M-obs scale) — which is what
solve_bundle_adjustment(mesh=...) and the driver dryrun route to. This
module remains only for (a) `build_ba_inputs`, the flat-array assembly
reused by `__graft_entry__.entry()` and the component benches, and
(b) an A/B reference point for the replicated design: per-observation
arrays sharded on the "obs" axis, ALL parameter blocks replicated, XLA
inserting one AllReduce per segment reduction. Do not add new callers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import BundleAdjusterOptions
from glomap_tpu.estimators.bundle_adjustment import (_solve_ba,
                                                     intrinsic_tie_matrix)
from glomap_tpu.parallel import mesh as meshmod
from glomap_tpu.scene.arrays import Scene, Tracks


def build_ba_inputs(scene: Scene, tracks: Tracks,
                    opts: BundleAdjusterOptions | None = None,
                    dtype=jnp.float32, locality_order: bool = False):
    """Assemble the flat BA arrays (host-side), same logic as
    solve_bundle_adjustment; returns (param_arrays, obs_arrays, statics).

    locality_order=True applies order_obs_for_locality (tracks renumbered
    by mean frame; the points table is permuted accordingly — callers
    that write X back must not use it) and fills statics point_width /
    frame_width for the single-chip Pallas windowed kernels."""
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
    xyz = tracks.xyz
    point_width = frame_width = 0
    if locality_order:
        from glomap_tpu.estimators.bundle_adjustment import (
            _axis_window, order_obs_for_locality)
        obs_perm, point_perm, new_of_old = order_obs_for_locality(
            o_frame, o_point, tracks.num_tracks)
        o_img = o_img[obs_perm]
        o_frame = o_frame[obs_perm]
        o_cam = o_cam[obs_perm]
        o_point = new_of_old[o_point[obs_perm]].astype(np.int32)
        xyz = tracks.xyz[point_perm]
        point_width = _axis_window(o_point)
        frame_width = _axis_window(o_frame)
    feat = tracks.obs_feature[ob_ok]
    if locality_order:
        feat = feat[obs_perm]
    o_sensor = scene.image_sensor[o_img]
    kp = scene.kp_offset[o_img] + feat

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

    params = dict(
        frame_quat=np.asarray(scene.frame_quat, dtype),
        frame_trans=np.asarray(scene.frame_trans, dtype),
        cam_params=np.asarray(scene.cam_params, dtype),
        cam_kind=np.asarray(scene.cam_kind, np.int32),
        points=np.asarray(xyz, dtype),
        cam_T=np.asarray(cam_T, dtype),
        frame_mask=np.asarray(frame_mask, dtype),
    )
    obs = dict(
        o_frame=o_frame, o_cam=o_cam, o_point=o_point,
        o_sensor=o_sensor.astype(np.int32),
        o_sensor_q=np.asarray(scene.sensor_quat[o_sensor], dtype),
        o_sensor_t=np.asarray(scene.sensor_trans[o_sensor], dtype),
        o_kind=scene.cam_kind[o_cam],
        o_uv=np.asarray(scene.kp_xy[kp], dtype),
        o_w=np.ones(len(o_img), dtype),
    )
    params["sensor_quat"] = np.asarray(scene.sensor_quat, dtype)
    params["sensor_trans"] = np.asarray(scene.sensor_trans, dtype)
    statics = dict(num_frames=F, num_cams=scene.num_cameras,
                   num_points=tracks.num_tracks,
                   huber_delta=float(opts.thres_loss_function),
                   function_tol=float(opts.function_tolerance),
                   max_iters=int(opts.max_num_iterations), cg_iters=30,
                   optimize_points=bool(opts.optimize_points),
                   point_width=point_width, frame_width=frame_width,
                   num_sensors=len(scene.sensor_quat))
    return params, obs, statics


def solve_ba_sharded(scene: Scene, tracks: Tracks, mesh=None,
                     opts: BundleAdjusterOptions | None = None,
                     dtype=jnp.float32):
    """Run _solve_ba with observation arrays sharded across the mesh.
    Writes results back into scene/tracks (like solve_bundle_adjustment).
    """
    mesh = mesh or meshmod.make_mesh()
    n_dev = np.prod([mesh.shape[a] for a in mesh.axis_names])
    params, obs, statics = build_ba_inputs(scene, tracks, opts, dtype)
    statics["point_width"] = 0  # pallas_call is opaque to SPMD sharding
    statics["frame_width"] = 0
    # pad obs to a multiple of the device count (padded rows carry w = 0
    # and index 0 everywhere -> harmless)
    obs = meshmod.pad_to_multiple(obs, int(n_dev))
    obs_sharded = {k: meshmod.shard_obs(mesh, v) for k, v in obs.items()}
    params_repl = {k: meshmod.replicate(mesh, v) for k, v in params.items()}

    fq, ft, cp, X, cost, it, _, _, _, _, _ = _solve_ba(
        params_repl["frame_quat"], params_repl["frame_trans"],
        params_repl["cam_params"], params_repl["points"],
        obs_sharded["o_frame"], obs_sharded["o_cam"],
        obs_sharded["o_point"], obs_sharded["o_sensor_q"],
        obs_sharded["o_sensor_t"], obs_sharded["o_kind"],
        obs_sharded["o_uv"], params_repl["cam_T"], obs_sharded["o_w"],
        params_repl["frame_mask"], o_sensor=obs_sharded["o_sensor"],
        sensor_quat=params_repl["sensor_quat"],
        sensor_trans=params_repl["sensor_trans"],
        cam_kind=params_repl["cam_kind"], **statics)

    scene.frame_quat[:] = np.asarray(fq, np.float64)
    scene.frame_trans[:] = np.asarray(ft, np.float64)
    scene.cam_params[:] = np.asarray(cp, np.float64)
    if statics["optimize_points"]:
        tracks.xyz[:] = np.asarray(X, np.float64)
    return float(cost), int(it)
