"""Keypoint undistortion: lift all features to unit bearing rays.

Counterpart of glomap/processors/image_undistorter.cc (UndistortImages):
instead of a CPU thread pool over images, ALL keypoints of all images are
lifted in one batched device sweep (per-keypoint camera params gathered by
index) — the vmap/jit replacement for per-image parallelism.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.ops import camera_models as cm
from glomap_tpu.scene.arrays import Scene

_rays_jit = jax.jit(cm.cam_rays_from_img, static_argnames="num_iters")


def undistort_images(scene: Scene, num_iters: int = 25) -> None:
    """Fill scene.kp_ray for every keypoint (one device call)."""
    if scene.num_keypoints == 0:
        return
    counts = np.diff(scene.kp_offset)
    kp_cam = np.repeat(scene.image_camera, counts)
    c = jnp.asarray(scene.cam_params[kp_cam])
    kind = jnp.asarray(scene.cam_kind[kp_cam])
    rays = _rays_jit(c, kind, jnp.asarray(scene.kp_xy), num_iters=num_iters)
    scene.kp_ray = np.array(rays, dtype=np.float64, copy=True)
