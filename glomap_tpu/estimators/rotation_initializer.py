"""Rig rotation bootstrap: per-image rotations -> rig calibration.

Counterpart of glomap/estimators/rotation_initializer.cc
(ConvertRotationsFromImageToRig): given per-image cam_from_world
rotations (e.g. from a trivial-frame rotation averaging pass), average
cam_from_ref_cam across frames into sensor_from_rig rotations for sensors
whose calibration is unknown, and set each frame's rig_from_world from
its reference image.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm
from glomap_tpu.scene.arrays import Scene

logger = logging.getLogger(__name__)


def convert_rotations_from_image_to_rig(scene: Scene,
                                        image_quat: np.ndarray) -> int:
    """image_quat: per-image cam_from_world rotations. Updates
    scene.sensor_quat for unknown sensors (marking them rotation-known)
    and scene.frame_quat from reference images. Returns #sensors set."""
    # reference image per frame = the frame's image whose sensor is the
    # rig's reference sensor
    ref_img = np.full(scene.num_frames, -1, dtype=np.int64)
    for k in range(scene.num_images):
        f = scene.image_frame[k]
        if scene.sensor_is_ref[scene.image_sensor[k]] and ref_img[f] < 0:
            ref_img[f] = k

    # collect cam_from_ref_cam per unknown sensor across frames
    per_sensor = {}
    for k in range(scene.num_images):
        s = scene.image_sensor[k]
        if scene.sensor_is_ref[s] or scene.sensor_known[s]:
            continue
        f = scene.image_frame[k]
        if ref_img[f] < 0:
            continue
        q_rel = rotm.quat_mul(image_quat[k],
                              rotm.quat_conj(image_quat[ref_img[f]]))
        per_sensor.setdefault(int(s), []).append(np.asarray(q_rel))

    n_set = 0
    for s, quats in per_sensor.items():
        q_avg = np.asarray(rotm.average_quats(np.stack(quats)))
        scene.sensor_quat[s] = q_avg
        # rotation now known; translation still to be estimated (by GP)
        n_set += 1

    # frame rotations from reference images (ref sensor pose = identity)
    for f in range(scene.num_frames):
        if ref_img[f] >= 0:
            scene.frame_quat[f] = image_quat[ref_img[f]]
    logger.info("Initialized %d sensor rotations from image rotations",
                n_set)
    return n_set
