"""Vectorized COLMAP-compatible camera models.

TPU-native counterpart of colmap's per-model templated CamFromImg /
ImgFromCam dispatch used throughout the reference (e.g.
glomap/processors/image_undistorter.cc:33-40,
glomap/estimators/bundle_adjustment.cc:129-186,
glomap/scene/camera.h:42-46).

Design: instead of a switch over 11 camera-model structs, every camera is
*canonicalized at ingestion* into one superset parameterization so that
projection of a mixed-model camera batch is a single branch-light
vectorized formula (VPU-friendly, no lax.switch in the hot path):

  canonical params (16 floats per camera):
    [0] fx   [1] fy   [2] cx   [3] cy
    [4..7]   k1..k4   radial numerator    1 + k1 r^2 + k2 r^4 + k3 r^6 + k4 r^8
    [8..10]  d1..d3   radial denominator  1 + d1 r^2 + d2 r^4 + d3 r^6
    [11..12] p1, p2   tangential
    [13..14] sx1, sy1 thin prism
    [15]     omega    FOV model parameter
  kind (int8 per camera): 0 = perspective, 1 = fisheye (equidistant base),
    2 = FOV.

All 11 COLMAP models map exactly onto this superset (the rational radial
covers FULL_OPENCV; the r^8 numerator term covers OPENCV_FISHEYE's theta^9
series). Distortion with all-zero coefficients is the identity, so the
uniform "apply polynomial distortion" step is correct for every kind.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# COLMAP model ids (public schema contract, stable across colmap versions).
SIMPLE_PINHOLE = 0
PINHOLE = 1
SIMPLE_RADIAL = 2
RADIAL = 3
OPENCV = 4
OPENCV_FISHEYE = 5
FULL_OPENCV = 6
FOV = 7
SIMPLE_RADIAL_FISHEYE = 8
RADIAL_FISHEYE = 9
THIN_PRISM_FISHEYE = 10
RADIAL1D = 11  # colmap Radial1DCameraModel ("1D_RADIAL")

MODEL_NAMES = {
    SIMPLE_PINHOLE: "SIMPLE_PINHOLE",
    PINHOLE: "PINHOLE",
    SIMPLE_RADIAL: "SIMPLE_RADIAL",
    RADIAL: "RADIAL",
    OPENCV: "OPENCV",
    OPENCV_FISHEYE: "OPENCV_FISHEYE",
    FULL_OPENCV: "FULL_OPENCV",
    FOV: "FOV",
    SIMPLE_RADIAL_FISHEYE: "SIMPLE_RADIAL_FISHEYE",
    RADIAL_FISHEYE: "RADIAL_FISHEYE",
    THIN_PRISM_FISHEYE: "THIN_PRISM_FISHEYE",
    RADIAL1D: "1D_RADIAL",
}
MODEL_IDS = {v: k for k, v in MODEL_NAMES.items()}
MODEL_IDS["RADIAL1D"] = RADIAL1D  # both spellings appear in the wild

NUM_PARAMS = {
    SIMPLE_PINHOLE: 3,
    PINHOLE: 4,
    SIMPLE_RADIAL: 4,
    RADIAL: 5,
    OPENCV: 8,
    OPENCV_FISHEYE: 8,
    FULL_OPENCV: 12,
    FOV: 5,
    SIMPLE_RADIAL_FISHEYE: 4,
    RADIAL_FISHEYE: 5,
    THIN_PRISM_FISHEYE: 12,
}

NUM_CANONICAL = 16
KIND_PERSPECTIVE, KIND_FISHEYE, KIND_FOV = 0, 1, 2

# Focal-length slots within each model's raw colmap param vector
# (mirrors colmap FocalLengthIdxs used by glomap/scene/camera.h:21-40).
FOCAL_IDXS = {
    SIMPLE_PINHOLE: (0,), PINHOLE: (0, 1), SIMPLE_RADIAL: (0,), RADIAL: (0,),
    OPENCV: (0, 1), OPENCV_FISHEYE: (0, 1), FULL_OPENCV: (0, 1), FOV: (0, 1),
    SIMPLE_RADIAL_FISHEYE: (0,), RADIAL_FISHEYE: (0,),
    THIN_PRISM_FISHEYE: (0, 1),
}
PRINCIPAL_POINT_IDXS = {
    SIMPLE_PINHOLE: (1, 2), PINHOLE: (2, 3), SIMPLE_RADIAL: (1, 2),
    RADIAL: (1, 2), OPENCV: (2, 3), OPENCV_FISHEYE: (2, 3),
    FULL_OPENCV: (2, 3), FOV: (2, 3), SIMPLE_RADIAL_FISHEYE: (1, 2),
    RADIAL_FISHEYE: (1, 2), THIN_PRISM_FISHEYE: (2, 3),
}


def canonicalize(model_id: int, params: np.ndarray) -> tuple[np.ndarray, int]:
    """Raw colmap params -> (canonical[16], kind). Host-side, per camera."""
    p = np.asarray(params, dtype=np.float64)
    c = np.zeros(NUM_CANONICAL, dtype=np.float64)
    kind = KIND_PERSPECTIVE
    if model_id == SIMPLE_PINHOLE:
        c[0] = c[1] = p[0]; c[2:4] = p[1:3]
    elif model_id == PINHOLE:
        c[0:4] = p[0:4]
    elif model_id == SIMPLE_RADIAL:
        c[0] = c[1] = p[0]; c[2:4] = p[1:3]; c[4] = p[3]
    elif model_id == RADIAL:
        c[0] = c[1] = p[0]; c[2:4] = p[1:3]; c[4:6] = p[3:5]
    elif model_id == OPENCV:
        c[0:4] = p[0:4]; c[4:6] = p[4:6]; c[11:13] = p[6:8]
    elif model_id == OPENCV_FISHEYE:
        c[0:4] = p[0:4]; c[4:8] = p[4:8]; kind = KIND_FISHEYE
    elif model_id == FULL_OPENCV:
        c[0:4] = p[0:4]; c[4:6] = p[4:6]; c[11:13] = p[6:8]
        c[6] = p[8]  # k3
        c[8:11] = p[9:12]  # k4,k5,k6 -> denominator
    elif model_id == FOV:
        c[0:4] = p[0:4]; c[15] = p[4]; kind = KIND_FOV
    elif model_id == SIMPLE_RADIAL_FISHEYE:
        c[0] = c[1] = p[0]; c[2:4] = p[1:3]; c[4] = p[3]; kind = KIND_FISHEYE
    elif model_id == RADIAL_FISHEYE:
        c[0] = c[1] = p[0]; c[2:4] = p[1:3]; c[4:6] = p[3:5]
        kind = KIND_FISHEYE
    elif model_id == THIN_PRISM_FISHEYE:
        c[0:4] = p[0:4]; c[4:6] = p[4:6]; c[11:13] = p[6:8]
        c[6:8] = p[8:10]; c[13:15] = p[10:12]
        kind = KIND_FISHEYE
    elif model_id == RADIAL1D:
        # Principled rejection: the 1D radial model (Larsson et al.)
        # constrains only the DIRECTION from the principal point — its
        # reprojection residual is a point-to-radial-line distance, not a
        # 2D point difference, so it cannot be expressed in the canonical
        # point-projection superset without silently changing the cost.
        # The reference inherits the same limitation implicitly: its BA
        # dispatches colmap point-reprojection functors per model
        # (bundle_adjustment.cc:129-186), which colmap only defines for
        # full-projection models. Calibrate such cameras to a
        # SIMPLE_RADIAL (or similar) model before mapping.
        raise ValueError(
            "1D_RADIAL cameras are not supported: the model has no "
            "point-projection (only radial directions); re-calibrate to "
            "a full model (e.g. SIMPLE_RADIAL) before running the mapper")
    else:
        raise ValueError(f"unknown camera model id {model_id}")
    return c, kind


def decanonicalize(model_id: int, c: np.ndarray) -> np.ndarray:
    """Canonical[16] -> raw colmap params (inverse of canonicalize)."""
    c = np.asarray(c, dtype=np.float64)
    n = NUM_PARAMS[model_id]
    p = np.zeros(n, dtype=np.float64)
    if model_id == SIMPLE_PINHOLE:
        p[0] = 0.5 * (c[0] + c[1]); p[1:3] = c[2:4]
    elif model_id == PINHOLE:
        p[0:4] = c[0:4]
    elif model_id == SIMPLE_RADIAL:
        p[0] = 0.5 * (c[0] + c[1]); p[1:3] = c[2:4]; p[3] = c[4]
    elif model_id == RADIAL:
        p[0] = 0.5 * (c[0] + c[1]); p[1:3] = c[2:4]; p[3:5] = c[4:6]
    elif model_id == OPENCV:
        p[0:4] = c[0:4]; p[4:6] = c[4:6]; p[6:8] = c[11:13]
    elif model_id == OPENCV_FISHEYE:
        p[0:4] = c[0:4]; p[4:8] = c[4:8]
    elif model_id == FULL_OPENCV:
        p[0:4] = c[0:4]; p[4:6] = c[4:6]; p[6:8] = c[11:13]
        p[8] = c[6]; p[9:12] = c[8:11]
    elif model_id == FOV:
        p[0:4] = c[0:4]; p[4] = c[15]
    elif model_id == SIMPLE_RADIAL_FISHEYE:
        p[0] = 0.5 * (c[0] + c[1]); p[1:3] = c[2:4]; p[3] = c[4]
    elif model_id == RADIAL_FISHEYE:
        p[0] = 0.5 * (c[0] + c[1]); p[1:3] = c[2:4]; p[3:5] = c[4:6]
    elif model_id == THIN_PRISM_FISHEYE:
        p[0:4] = c[0:4]; p[4:6] = c[4:6]; p[6:8] = c[11:13]
        p[8:10] = c[6:8]; p[10:12] = c[13:15]
    else:
        raise ValueError(f"unknown camera model id {model_id}")
    return p


# ----------------------------------------------------------------------------
# Device-side vectorized projection (the BA hot path)
# ----------------------------------------------------------------------------


def distort(c: jax.Array, uv: jax.Array) -> jax.Array:
    """Apply the polynomial (rational radial + tangential + prism) part.

    c: (..., 16) canonical params, uv: (..., 2) base coordinates.
    """
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    r8 = r4 * r4
    num = 1.0 + c[..., 4] * r2 + c[..., 5] * r4 + c[..., 6] * r6 + c[..., 7] * r8
    den = 1.0 + c[..., 8] * r2 + c[..., 9] * r4 + c[..., 10] * r6
    radial = num / den
    p1, p2 = c[..., 11], c[..., 12]
    sx1, sy1 = c[..., 13], c[..., 14]
    uv2 = 2.0 * u * v
    du = u * radial + p1 * uv2 + p2 * (r2 + 2.0 * u * u) + sx1 * r2
    dv = v * radial + p2 * uv2 + p1 * (r2 + 2.0 * v * v) + sy1 * r2
    return jnp.stack([du, dv], axis=-1)


def _fov_base(c, x, y, r):
    """FOV model radius transform rd = atan(2 r tan(w/2)) / w, small-w safe."""
    omega = c[..., 15]
    w_safe = jnp.where(jnp.abs(omega) < 1e-6, 1e-6, omega)
    tan_half = jnp.tan(0.5 * w_safe)
    rd = jnp.arctan(2.0 * r * tan_half) / w_safe
    factor = jnp.where(r < 1e-9, 2.0 * tan_half / w_safe, rd / jnp.maximum(r, 1e-9))
    factor = jnp.where(jnp.abs(omega) < 1e-6, 1.0, factor)
    return x * factor, y * factor


def img_from_cam(c: jax.Array, kind: jax.Array, xyz: jax.Array) -> jax.Array:
    """Project camera-frame points (..., 3) to pixels (..., 2).

    Branchless over camera kinds via select (3 cheap alternatives, VPU).
    Differentiable w.r.t. both c and xyz (used by BA autodiff Jacobians).
    """
    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    z_safe = jnp.where(jnp.abs(Z) < 1e-9, 1e-9, Z)
    x = X / z_safe
    y = Y / z_safe
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))

    # fisheye (equidistant): theta = atan(r); scale chord to theta
    theta = jnp.arctan(r)
    fe_scale = theta / r
    fx_u, fx_v = x * fe_scale, y * fe_scale
    # FOV transform
    fov_u, fov_v = _fov_base(c, x, y, r)

    u = jnp.where(kind == KIND_FISHEYE, fx_u, jnp.where(kind == KIND_FOV, fov_u, x))
    v = jnp.where(kind == KIND_FISHEYE, fx_v, jnp.where(kind == KIND_FOV, fov_v, y))
    duv = distort(c, jnp.stack([u, v], axis=-1))
    px = c[..., 0] * duv[..., 0] + c[..., 2]
    py = c[..., 1] * duv[..., 1] + c[..., 3]
    return jnp.stack([px, py], axis=-1)


def undistort(c: jax.Array, kind: jax.Array, uv_dist: jax.Array,
              num_iters: int = 25) -> jax.Array:
    """Invert `distort` by Newton iterations with exact 2x2 Jacobians.

    Counterpart of colmap's iterative undistortion used by
    glomap/processors/image_undistorter.cc. Fixed iteration count =
    compiler-friendly static loop (lax.fori_loop under jit).
    """
    def body(_, uv):
        fn = lambda p: distort(c, p)
        f = fn(uv) - uv_dist
        # Jacobian columns via jvp on the two basis directions — works for
        # arbitrary leading batch shapes (no per-ndim vmap dispatch).
        e1 = jnp.zeros_like(uv).at[..., 0].set(1.0)
        e2 = jnp.zeros_like(uv).at[..., 1].set(1.0)
        _, jc1 = jax.jvp(fn, (uv,), (e1,))
        _, jc2 = jax.jvp(fn, (uv,), (e2,))
        a, d = jc1[..., 0], jc1[..., 1]  # d distort / d u
        b, e = jc2[..., 0], jc2[..., 1]  # d distort / d v
        det = a * e - b * d
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (e * f[..., 0] - b * f[..., 1]) / det
        dy = (-d * f[..., 0] + a * f[..., 1]) / det
        return uv - jnp.stack([dx, dy], axis=-1)

    return jax.lax.fori_loop(0, num_iters, body, uv_dist)


def cam_from_img(c: jax.Array, kind: jax.Array, px: jax.Array,
                 num_iters: int = 25) -> jax.Array:
    """Pixels (..., 2) -> normalized coords on the z=1 plane (..., 2)."""
    u = (px[..., 0] - c[..., 2]) / c[..., 0]
    v = (px[..., 1] - c[..., 3]) / c[..., 1]
    uv = undistort(c, kind, jnp.stack([u, v], axis=-1), num_iters)
    bu, bv = uv[..., 0], uv[..., 1]
    rb = jnp.sqrt(jnp.maximum(bu * bu + bv * bv, 1e-24))
    # invert fisheye: base radius is theta, true radius r = tan(theta)
    theta = jnp.clip(rb, 0.0, jnp.pi / 2 - 1e-4)
    fe_scale = jnp.tan(theta) / rb
    # invert FOV: rd -> r = tan(rd * w) / (2 tan(w/2))
    omega = c[..., 15]
    w_safe = jnp.where(jnp.abs(omega) < 1e-6, 1e-6, omega)
    r_fov = jnp.tan(jnp.clip(rb * w_safe, -jnp.pi / 2 + 1e-4, jnp.pi / 2 - 1e-4)) \
        / (2.0 * jnp.tan(0.5 * w_safe))
    fov_scale = jnp.where(jnp.abs(omega) < 1e-6, 1.0, r_fov / rb)

    scale = jnp.where(kind == KIND_FISHEYE, fe_scale,
                      jnp.where(kind == KIND_FOV, fov_scale, 1.0))
    return uv * scale[..., None]


def cam_rays_from_img(c: jax.Array, kind: jax.Array, px: jax.Array,
                      num_iters: int = 25) -> jax.Array:
    """Pixels -> unit bearing rays in the camera frame (..., 3).

    Counterpart of the `features_undist` arrays the reference attaches to
    every image (glomap/scene/image.h, image_undistorter.cc).
    """
    xy = cam_from_img(c, kind, px, num_iters)
    ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def mean_focal(c: jax.Array) -> jax.Array:
    return 0.5 * (c[..., 0] + c[..., 1])
