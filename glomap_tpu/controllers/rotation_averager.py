"""Rotation averager controller: stratified mixed-prior solving + rig
bootstrap.

Counterpart of glomap/controllers/rotation_averager.{h,cc}
(SolveRotationAveraging): with gravity priors + use_stratified, first
solve the 1-DoF subsystem on the gravity-only subgraph (unless it is
empty or covers >95% of pairs), then the full mixed system. Cameras with
unknown cam_from_rig are handled by the reference's trivial-rig scheme
(:74-194): solve a rotation averaging problem where every unknown-sensor
image is its own frame, derive sensor rotations by quaternion averaging
(rotation_initializer), then re-solve the rigged system without
re-initialization.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace

import numpy as np

from glomap_tpu.config import RotationEstimatorOptions
from glomap_tpu.estimators.rotation_averaging import estimate_rotations
from glomap_tpu.estimators.rotation_initializer import (
    convert_rotations_from_image_to_rig)
from glomap_tpu.math import rotation as rotm
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


@dataclass
class RotationAveragerOptions(RotationEstimatorOptions):
    use_stratified: bool = True


def _solve_trivial_expansion(scene: Scene, vg: ViewGraph, opts,
                             est=estimate_rotations) -> np.ndarray | None:
    """Rotation averaging with unknown-sensor images expanded into their
    own frames; returns per-image cam_from_world quaternions."""
    unknown_img = ~scene.sensor_known[scene.image_sensor]
    n_unknown = int(unknown_img.sum())
    tmp = scene.copy()
    F = scene.num_frames
    new_frame_ids = np.arange(n_unknown) + F
    tmp.image_frame = scene.image_frame.copy()
    tmp.image_frame[unknown_img] = new_frame_ids.astype(np.int32)
    # expanded frames: identity pose, registered as their source frame
    tmp.frame_quat = np.concatenate(
        [scene.frame_quat, np.tile([1.0, 0, 0, 0], (n_unknown, 1))])
    tmp.frame_trans = np.concatenate(
        [scene.frame_trans, np.zeros((n_unknown, 3))])
    tmp.frame_registered = np.concatenate(
        [scene.frame_registered,
         scene.frame_registered[scene.image_frame[unknown_img]]])
    tmp.frame_ids = np.concatenate(
        [scene.frame_ids, new_frame_ids + scene.frame_ids.max() + 1])
    tmp.frame_rig = np.concatenate(
        [scene.frame_rig, np.zeros(n_unknown, np.int32)])
    tmp.frame_cluster = np.concatenate(
        [scene.frame_cluster, np.zeros(n_unknown, np.int32)])
    tmp.frame_has_gravity = np.concatenate(
        [scene.frame_has_gravity, np.zeros(n_unknown, bool)])
    tmp.frame_gravity = np.concatenate(
        [scene.frame_gravity, np.zeros((n_unknown, 3))])
    # unknown-sensor images act as reference sensors of their own frames
    tmp.image_sensor = scene.image_sensor.copy()
    ident = np.nonzero(scene.sensor_is_ref)[0]
    ref_sensor = int(ident[0]) if len(ident) else 0
    tmp.image_sensor[unknown_img] = ref_sensor

    trivial_opts = replace(opts) if hasattr(opts, "__dataclass_fields__") \
        else opts
    if not est(tmp, vg, trivial_opts):
        return None
    import jax.numpy as jnp
    q_img, _ = tmp.image_cam_from_world()
    return np.asarray(q_img)


def solve_rotation_averaging(scene: Scene, vg: ViewGraph,
                             opts: RotationAveragerOptions | None = None,
                             mesh=None) -> bool:
    """mesh: optional jax.sharding.Mesh — routes every solve through the
    edge-sharded estimator (parallel/sharded_ra.py)."""
    opts = opts or RotationAveragerOptions()
    vg.keep_largest_connected_component(scene)
    if mesh is not None:
        from glomap_tpu.parallel.sharded_ra import solve_rotations_sharded

        def est(scene_, vg_, opts_=None, pair_mask=None):
            return solve_rotations_sharded(scene_, vg_, mesh, opts_,
                                           pair_mask=pair_mask)
    else:
        est = estimate_rotations
    return _solve_rotation_averaging(scene, vg, opts, est)


def _solve_rotation_averaging(scene: Scene, vg: ViewGraph, opts, est) -> bool:

    solve_1dof = opts.use_gravity and opts.use_stratified and \
        scene.frame_has_gravity.any()
    if solve_1dof:
        f_i = scene.image_frame[vg.pair_i]
        f_j = scene.image_frame[vg.pair_j]
        grav_pair = vg.pair_valid & scene.frame_has_gravity[f_i] & \
            scene.frame_has_gravity[f_j]
        total = int(vg.pair_valid.sum())
        n_grav = int(grav_pair.sum())
        logger.info("Total image pairs: %d, gravity image pairs: %d",
                    total, n_grav)
        if n_grav == 0 or n_grav > 0.95 * total:
            solve_1dof = False
        if solve_1dof:
            # all frames in the subgraph carry gravity -> pure 1-DoF solve
            if not est(scene, vg, opts, pair_mask=grav_pair):
                return False

    has_unknown = not scene.sensor_known.all()
    if has_unknown and not opts.skip_initialization:
        logger.info("Running trivial rotation averaging for rigged cameras")
        q_img = _solve_trivial_expansion(scene, vg, opts, est)
        if q_img is None:
            return False
        convert_rotations_from_image_to_rig(scene, q_img)
        scene.sensor_known[:] = True
        from dataclasses import replace as _replace
        opts2 = _replace(opts, skip_initialization=True) \
            if hasattr(opts, "__dataclass_fields__") else opts
        return est(scene, vg, opts2)

    return est(scene, vg, opts)
