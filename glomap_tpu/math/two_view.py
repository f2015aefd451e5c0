"""Batched two-view geometry: epipolar errors, cheirality, E/F from motion.

TPU-native counterpart of glomap/math/two_view_geometry.{h,cc} — same
formulas (squared Sampson error, PoseLib-style cheirality on unit rays,
orientation signum for F), vectorized over arbitrary batches of
(pairs x matches) so inlier scoring runs as one dense VPU sweep instead of
a CPU thread pool (reference processors/image_pair_inliers.cc).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm
from glomap_tpu.math.rotation import _xp

EPS = 1e-12


def skew(t):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    xp = _xp(t)
    z = xp.zeros_like(t[..., 0])
    rows = [
        xp.stack([z, -t[..., 2], t[..., 1]], -1),
        xp.stack([t[..., 2], z, -t[..., 0]], -1),
        xp.stack([-t[..., 1], t[..., 0], z], -1),
    ]
    return xp.stack(rows, axis=-2)


def essential_from_motion(quat, trans):
    """E = [t]_x R for cam2_from_cam1 = (quat, trans).

    Reference: glomap/math/two_view_geometry.cc EssentialFromMotion.
    """
    return skew(trans) @ rotm.quat_to_rotmat(quat)


def fundamental_from_motion(K1_inv, K2_inv, quat, trans):
    """F = K2^-T E K1^-1 (reference FundamentalFromMotionAndCameras)."""
    xp = _xp(K1_inv, K2_inv, quat, trans)
    E = essential_from_motion(quat, trans)
    return xp.swapaxes(K2_inv, -1, -2) @ E @ K1_inv


def calib_matrix(fx, fy, cx, cy):
    """Pinhole K (...,) scalars -> (..., 3, 3)."""
    xp = _xp(fx, fy, cx, cy)
    z = xp.zeros_like(fx)
    o = xp.ones_like(fx)
    rows = [
        xp.stack([fx, z, cx], -1),
        xp.stack([z, fy, cy], -1),
        xp.stack([z, z, o], -1),
    ]
    return xp.stack(rows, axis=-2)


def calib_matrix_inv(fx, fy, cx, cy):
    xp = _xp(fx, fy, cx, cy)
    z = xp.zeros_like(fx)
    o = xp.ones_like(fx)
    rows = [
        xp.stack([1.0 / fx, z, -cx / fx], -1),
        xp.stack([z, 1.0 / fy, -cy / fy], -1),
        xp.stack([z, z, o], -1),
    ]
    return xp.stack(rows, axis=-2)


def sampson_error_sq(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Squared Sampson error; x1/x2 are homogeneous 3-vectors with the
    normalization the reference applies (divide by z component first).

    E: (..., 3, 3); x1, x2: (..., 3). Returns (...,).
    """
    xp = _xp(E, x1, x2)
    x1n = x1 / (EPS + x1[..., 2:3])
    x2n = x2 / (EPS + x2[..., 2:3])
    Ex1 = xp.einsum("...ij,...j->...i", E, x1n)
    Etx2 = xp.einsum("...ji,...j->...i", E, x2n)
    C = xp.sum(Ex1 * x2n, axis=-1)
    denom = (Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 +
             Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2)
    return C * C / xp.maximum(denom, EPS)


def sampson_error_sq_rows(E9: jax.Array, x1T: jax.Array,
                          x2T: jax.Array) -> jax.Array:
    """Squared Sampson error in lane-major (transposed) layout.

    E9 (9, M) row-major flattened E per match; x1T, x2T (3, M) homogeneous
    points. TPU tile padding makes (M, 3, 3) per-match tensors explode
    ~50x in memory (trailing dims pad to the 128-lane tile); keeping M as
    the trailing axis makes every intermediate a full-width vector op.
    """
    xp = _xp(E9, x1T, x2T)
    z1 = x1T[2] + EPS
    z2 = x2T[2] + EPS
    a0, a1 = x1T[0] / z1, x1T[1] / z1
    b0, b1 = x2T[0] / z2, x2T[1] / z2
    one = xp.ones_like(a0)
    Ex0 = E9[0] * a0 + E9[1] * a1 + E9[2] * one
    Ex1 = E9[3] * a0 + E9[4] * a1 + E9[5] * one
    Ex2 = E9[6] * a0 + E9[7] * a1 + E9[8] * one
    Et0 = E9[0] * b0 + E9[3] * b1 + E9[6] * one
    Et1 = E9[1] * b0 + E9[4] * b1 + E9[7] * one
    C = Ex0 * b0 + Ex1 * b1 + Ex2 * one
    denom = Ex0 * Ex0 + Ex1 * Ex1 + Et0 * Et0 + Et1 * Et1
    return C * C / xp.maximum(denom, EPS)


def sampson_error_sq_2d(E: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Squared Sampson error on 2D (inhomogeneous) points."""
    xp = _xp(E, uv1, uv2)
    x1 = xp.concatenate([uv1, xp.ones_like(uv1[..., :1])], axis=-1)
    x2 = xp.concatenate([uv2, xp.ones_like(uv2[..., :1])], axis=-1)
    return sampson_error_sq(E, x1, x2)


def homography_error_sq(H: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Squared transfer error |H x1 - x2|^2 (reference HomographyError)."""
    xp = _xp(H, uv1, uv2)
    x1 = xp.concatenate([uv1, xp.ones_like(uv1[..., :1])], axis=-1)
    Hx1 = xp.einsum("...ij,...j->...i", H, x1)
    Hx1n = Hx1[..., :2] / (EPS + Hx1[..., 2:3])
    return xp.sum((Hx1n - uv2) ** 2, axis=-1)


def check_cheirality(quat: jax.Array, trans: jax.Array,
                     x1: jax.Array, x2: jax.Array,
                     min_depth: float = 0.0, max_depth: float = 100.0):
    """Two-ray cheirality (PoseLib style, reference CheckCheirality).

    x1, x2 must be unit bearing rays; pose maps cam1 -> cam2. Batched.
    """
    xp = _xp(quat, trans, x1, x2)
    Rx1 = rotm.quat_rotate(quat, x1)
    a = -xp.sum(Rx1 * x2, axis=-1)
    b1 = -xp.sum(Rx1 * trans, axis=-1)
    b2 = xp.sum(x2 * trans, axis=-1)
    lam1 = b1 - a * b2
    lam2 = -a * b1 + b2
    scale = 1.0 - a * a
    lo = min_depth * scale
    hi = max_depth * scale
    return (lam1 > lo) & (lam2 > lo) & (lam1 < hi) & (lam2 < hi)


def orientation_signum(F: jax.Array, epipole: jax.Array,
                       pt1: jax.Array, pt2: jax.Array) -> jax.Array:
    """Orientation signum for F-matrix cheirality (reference
    GetOrientationSignum, GC-RANSAC-style)."""
    s1 = (F[..., 0, 0] * pt2[..., 0] + F[..., 1, 0] * pt2[..., 1] +
          F[..., 2, 0])
    s2 = epipole[..., 1] - epipole[..., 2] * pt1[..., 1]
    return s1 * s2


def epipole_from_F(F: jax.Array) -> jax.Array:
    """Left epipole of F (null vector of F^T) via cross products.

    e' with e'^T F = 0: use the two most independent rows of F... the
    reference uses F.col(0).cross(F.col(2)); we match that behavior.
    """
    return _xp(F).cross(F[..., :, 0], F[..., :, 2], axis=-1)


def triangulation_angle_rad(center1: jax.Array, center2: jax.Array,
                            point: jax.Array) -> jax.Array:
    """Angle subtended at `point` by the two camera centers (batched)."""
    xp = _xp(center1, center2, point)
    d1 = center1 - point
    d2 = center2 - point
    c = xp.sum(d1 * d2, axis=-1) / xp.maximum(
        xp.linalg.norm(d1, axis=-1) * xp.linalg.norm(d2, axis=-1), EPS)
    return xp.arccos(xp.clip(c, -1.0, 1.0))
