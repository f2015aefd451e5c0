"""Batched rotation math: quaternions, SO(3) exp/log, rigid transforms.

TPU-native counterpart of reference glomap/math/rigid3d.{h,cc} (angle
metrics, angle-axis <-> rotation, pose centers) — re-designed as pure,
vmap/jit-safe functions over stacked arrays rather than per-object Eigen
calls.

ARRAY-AGNOSTIC: every function dispatches on its inputs — jax arrays
(or tracers) use jnp, plain numpy uses numpy. Host-side orchestration
(scene prep, filters, MST init) passes numpy and never touches the
accelerator: through a remote-TPU tunnel each eager device op costs a
dispatch round-trip (and a mini remote compile on first shape), which
made numpy-in/jax-out host code 100-1000x slower than numpy.

Conventions (COLMAP-compatible):
  * quaternions are (w, x, y, z), unit norm, acting as x' = R(q) x
  * poses are `cam_from_world`: x_cam = R x_world + t
  * batched: every function accepts arbitrary leading batch dimensions
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _xp(*arrays):
    """numpy unless any argument is a jax array/tracer."""
    for a in arrays:
        if isinstance(a, jax.Array):
            return jnp
    return np


# ----------------------------------------------------------------------------
# Quaternions
# ----------------------------------------------------------------------------


def quat_normalize(q):
    """Normalize to a unit quaternion with positive scalar part."""
    xp = _xp(q)
    q = q / xp.linalg.norm(q, axis=-1, keepdims=True)
    return xp.where(q[..., :1] < 0, -q, q)


def quat_mul(a, b):
    """Hamilton product a*b; composes rotations: R(a*b) = R(a) R(b)."""
    xp = _xp(a, b)
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return xp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    xp = _xp(q)
    return q * xp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    xp = _xp(q, v)
    w = q[..., :1]
    u = q[..., 1:]
    uv = xp.cross(u, v)
    return v + 2.0 * (w * uv + xp.cross(u, uv))


def quat_to_rotmat(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    xp = _xp(q)
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = xp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4).

    Branchless Shepperd's method: compute all four candidate quaternions
    (each numerically stable in a different region) and select the one
    keyed by the largest of (trace, R00, R11, R22). vmap/jit safe.
    """
    xp = _xp(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate k is the true quaternion scaled by s_k = 2*sqrt(radicand_k):
    # slot k holds the radicand itself, the others the raw off-diag combos.
    c0 = xp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    c1 = xp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    c2 = xp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    c3 = xp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = xp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4 candidates, 4)

    scores = xp.stack([tr, m00, m11, m22], axis=-1)
    idx = xp.argmax(scores, axis=-1)
    q = xp.take_along_axis(cands, idx[..., None, None].astype(xp.int32),
                           axis=-2)
    return quat_normalize(q[..., 0, :])


# ----------------------------------------------------------------------------
# SO(3) exp / log
# ----------------------------------------------------------------------------


def so3_exp_quat(w):
    """Angle-axis vector (..., 3) -> unit quaternion, small-angle safe."""
    xp = _xp(w)
    theta2 = xp.sum(w * w, axis=-1, keepdims=True)
    theta = xp.sqrt(xp.maximum(theta2, 1e-30))
    half = 0.5 * theta
    small = theta2 < 1e-12
    # sin(x/2)/x  ~  1/2 - x^2/48 for small x
    k = xp.where(small, 0.5 - theta2 / 48.0, xp.sin(half) / theta)
    qw = xp.where(small, 1.0 - theta2 / 8.0, xp.cos(half))
    return quat_normalize(xp.concatenate([qw, k * w], axis=-1))


def so3_exp(w):
    """Angle-axis vector (..., 3) -> rotation matrix (..., 3, 3)."""
    return quat_to_rotmat(so3_exp_quat(w))


def quat_to_angle_axis(q):
    """Unit quaternion -> angle-axis vector (..., 3); robust near 0 and pi."""
    xp = _xp(q)
    q = xp.where(q[..., :1] < 0, -q, q)  # take the short arc
    w = q[..., 0]
    vn = xp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * xp.arctan2(vn, w)
    # theta / sin(theta/2) = theta / vn ; small-angle: 2 + theta^2/12
    small = vn < 1e-8
    scale = xp.where(small, 2.0 + theta * theta / 12.0,
                     theta / xp.maximum(vn, 1e-30))
    return scale[..., None] * q[..., 1:]


def so3_log(R):
    """Rotation matrix -> angle-axis vector; robust near 0 and pi.

    Counterpart of reference glomap/math/rigid3d.cc RotationToAngleAxis —
    implemented via the quaternion route which is branch-free and stable.
    """
    return quat_to_angle_axis(rotmat_to_quat(R))


def rotation_angle_rad(R):
    """Rotation angle in radians of (..., 3, 3) matrices."""
    xp = _xp(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = xp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return xp.arccos(c)


def quat_angle_rad(q):
    """Rotation angle in radians of unit quaternions."""
    xp = _xp(q)
    q = xp.where(q[..., :1] < 0, -q, q)
    return 2.0 * xp.arctan2(xp.linalg.norm(q[..., 1:], axis=-1), q[..., 0])


def relative_quat_angle_rad(q1, q2):
    """Angle between two rotations given as quaternions (geodesic metric)."""
    xp = _xp(q1, q2)
    dot = xp.abs(xp.sum(q1 * q2, axis=-1))
    return 2.0 * xp.arccos(xp.clip(dot, -1.0, 1.0))


# ----------------------------------------------------------------------------
# Rigid transforms (cam_from_world): q (..., 4), t (..., 3)
# ----------------------------------------------------------------------------


def rigid_apply(q, t, x):
    return quat_rotate(q, x) + t


def rigid_inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def rigid_compose(q2, t2, q1, t1):
    """(q2,t2) ∘ (q1,t1): apply (q1,t1) first."""
    return quat_mul(q2, q1), quat_rotate(q2, t1) + t2


def pose_center(q, t):
    """Projection center of a cam_from_world pose: -R^T t.

    Reference: glomap/math/rigid3d.h CenterFromPose.
    """
    return -quat_rotate(quat_conj(q), t)


def degrees(x):
    return x * (180.0 / np.pi)


def radians(x):
    return x * (np.pi / 180.0)


def average_quats(quats, weights=None):
    """Chordal-L2 mean of unit quaternions (largest eigenvector of sum qq^T).

    Counterpart of colmap AverageQuaternions used by the reference rotation
    initializer (glomap/estimators/rotation_initializer.cc:7).
    """
    xp = _xp(quats, weights)
    if weights is None:
        weights = xp.ones(quats.shape[:-1], dtype=quats.dtype)
    M = xp.einsum("...n,...ni,...nj->...ij", weights, quats, quats)
    _, vecs = xp.linalg.eigh(M)
    return quat_normalize(vecs[..., -1])
