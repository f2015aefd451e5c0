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
    """Per-keypoint camera params gathered by (K,) indices; runs on
    whichever backend its inputs live on."""
    return cm.cam_rays_from_img(cam_params[kp_cam], cam_kind[kp_cam], kp_xy)


def undistort_images(scene: Scene, num_iters: int = 25) -> None:
    """Fill scene.kp_ray for every keypoint. Also caches the rays on the
    accelerator (scene cache, reused by inlier scoring / relpose).

    The lift runs on the LOCAL CPU backend even when the default device
    is a tunneled TPU: the math is memory-light (181k rays ~ milliseconds
    either way) but on the remote chip the first call pays a
    multi-second executable load — or a multi-minute remote compile on a
    cold cache (the camera-model switch + Newton while_loop is a large
    graph) — plus a device->host download of the result. Computing on
    host CPU and UPLOADING the cache (uploads are cheap, ~30 MB/s;
    cold-cache downloads measured 100x slower) cut the relpose stage's
    fixed cost from ~70 s to < 1 s.
    """
    if scene.num_keypoints == 0:
        return
    import logging
    import time as _time
    _t0 = _time.monotonic()
    counts = np.diff(scene.kp_offset)
    kp_cam = np.repeat(scene.image_camera, counts).astype(np.int32)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        rays = _rays_from_indices(
            jax.device_put(scene.cam_params, cpu),
            jax.device_put(scene.cam_kind, cpu),
            jax.device_put(kp_cam, cpu),
            jax.device_put(scene.kp_xy, cpu))
        rays_np = np.asarray(rays)
    _t1 = _time.monotonic()
    scene.kp_ray = np.asarray(rays_np, dtype=np.float64)
    cache_device_keypoints(scene)
    _t2 = _time.monotonic()
    logging.getLogger(__name__).info(
        "undistort: cpu lift %.1fs, device cache upload %.1fs",
        _t1 - _t0, _t2 - _t1)


def cache_device_keypoints(scene: Scene, rays=None):
    """Keep lane-major (3, K) rays and (2, K) pixels resident on device;
    refreshed whenever undistort_images recomputes. Transposes on host so
    each cache entry is ONE contiguous upload (no eager device ops)."""
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    r = np.asarray(rays) if rays is not None else scene.kp_ray
    scene._kp_rayT_dev = jnp.asarray(
        np.ascontiguousarray(np.asarray(r).T, dtype=dt))
    scene._kp_xyT_dev = jnp.asarray(
        np.ascontiguousarray(scene.kp_xy.T, dtype=dt))


def device_keypoints(scene: Scene):
    """(kp_rayT (3, K), kp_xyT (2, K)) device arrays, uploaded once."""
    if getattr(scene, "_kp_rayT_dev", None) is None or \
            getattr(scene, "_kp_xyT_dev", None) is None:
        cache_device_keypoints(scene)
    return scene._kp_rayT_dev, scene._kp_xyT_dev
