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


@jax.jit
def _rays_from_indices(cam_params, cam_kind, kp_cam, kp_xy):
    """Gather per-keypoint camera params ON DEVICE (shipping (K,) indices
    instead of a (K, 16) host-gathered table — the host->device transfer
    through the remote tunnel dominated the stage otherwise)."""
    return cm.cam_rays_from_img(cam_params[kp_cam], cam_kind[kp_cam], kp_xy)


def undistort_images(scene: Scene, num_iters: int = 25) -> None:
    """Fill scene.kp_ray for every keypoint (one device call). Also caches
    the rays on device (scene cache, reused by inlier scoring / relpose)."""
    if scene.num_keypoints == 0:
        return
    import logging
    import time as _time
    _t0 = _time.monotonic()
    counts = np.diff(scene.kp_offset)
    kp_cam = np.repeat(scene.image_camera, counts).astype(np.int32)
    _t1 = _time.monotonic()
    rays = _rays_from_indices(jnp.asarray(scene.cam_params),
                              jnp.asarray(scene.cam_kind),
                              jnp.asarray(kp_cam),
                              jnp.asarray(scene.kp_xy))
    rays.block_until_ready()
    _t2 = _time.monotonic()
    scene.kp_ray = np.array(rays, dtype=np.float64, copy=True)
    cache_device_keypoints(scene, rays)
    _t3 = _time.monotonic()
    logging.getLogger(__name__).info(
        "undistort: host %.1fs, device %.1fs, download+cache %.1fs",
        _t1 - _t0, _t2 - _t1, _t3 - _t2)


def cache_device_keypoints(scene: Scene, rays=None):
    """Keep lane-major (3, K) rays and (2, K) pixels resident on device;
    refreshed whenever undistort_images recomputes."""
    r = rays if rays is not None else jnp.asarray(scene.kp_ray)
    scene._kp_rayT_dev = jnp.asarray(r).T
    scene._kp_xyT_dev = jnp.asarray(scene.kp_xy).T


def device_keypoints(scene: Scene):
    """(kp_rayT (3, K), kp_xyT (2, K)) device arrays, uploaded once."""
    if getattr(scene, "_kp_rayT_dev", None) is None or \
            getattr(scene, "_kp_xyT_dev", None) is None:
        cache_device_keypoints(scene)
    return scene._kp_rayT_dev, scene._kp_xyT_dev
