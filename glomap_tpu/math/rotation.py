"""Batched rotation math: quaternions, SO(3) exp/log, rigid transforms.

TPU-native counterpart of reference glomap/math/rigid3d.{h,cc} (angle
metrics, angle-axis <-> rotation, pose centers) — re-designed as pure,
vmap/jit-safe functions over stacked arrays rather than per-object Eigen
calls.

Conventions (COLMAP-compatible):
  * quaternions are (w, x, y, z), unit norm, acting as x' = R(q) x
  * poses are `cam_from_world`: x_cam = R x_world + t
  * batched: every function accepts arbitrary leading batch dimensions
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Quaternions
# ----------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize to a unit quaternion with positive scalar part."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b; composes rotations: R(a*b) = R(a) R(b)."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4).

    Branchless Shepperd's method: compute all four candidate quaternions
    (each numerically stable in a different region) and select the one
    keyed by the largest of (trace, R00, R11, R22). vmap/jit safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate k is the true quaternion scaled by s_k = 2*sqrt(radicand_k):
    # slot k holds the radicand itself, the others the raw off-diag combos.
    c0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    c1 = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    c2 = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    c3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4 candidates, 4)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    return quat_normalize(q[..., 0, :])


# ----------------------------------------------------------------------------
# SO(3) exp / log
# ----------------------------------------------------------------------------


def so3_exp_quat(w: jax.Array) -> jax.Array:
    """Angle-axis vector (..., 3) -> unit quaternion, small-angle safe."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    half = 0.5 * theta
    small = theta2 < 1e-12
    # sin(x/2)/x  ~  1/2 - x^2/48 for small x
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([qw, k * w], axis=-1))


def so3_exp(w: jax.Array) -> jax.Array:
    """Angle-axis vector (..., 3) -> rotation matrix (..., 3, 3)."""
    return quat_to_rotmat(so3_exp_quat(w))


def quat_to_angle_axis(q: jax.Array) -> jax.Array:
    """Unit quaternion -> angle-axis vector (..., 3); robust near 0 and pi."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # take the short arc
    w = q[..., 0]
    vn = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    # theta / sin(theta/2) = theta / vn ; small-angle: 2 + theta^2/12
    small = vn < 1e-8
    scale = jnp.where(small, 2.0 + theta * theta / 12.0,
                      theta / jnp.maximum(vn, 1e-30))
    return scale[..., None] * q[..., 1:]


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> angle-axis vector; robust near 0 and pi.

    Counterpart of reference glomap/math/rigid3d.cc RotationToAngleAxis —
    implemented via the quaternion route which is branch-free and stable.
    """
    return quat_to_angle_axis(rotmat_to_quat(R))


def rotation_angle_rad(R: jax.Array) -> jax.Array:
    """Rotation angle in radians of (..., 3, 3) matrices."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


def quat_angle_rad(q: jax.Array) -> jax.Array:
    """Rotation angle in radians of unit quaternions."""
    q = jnp.where(q[..., :1] < 0, -q, q)
    return 2.0 * jnp.arctan2(jnp.linalg.norm(q[..., 1:], axis=-1), q[..., 0])


def relative_quat_angle_rad(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle between two rotations given as quaternions (geodesic metric)."""
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))


# ----------------------------------------------------------------------------
# Rigid transforms (cam_from_world): q (..., 4), t (..., 3)
# ----------------------------------------------------------------------------


def rigid_apply(q: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
    return quat_rotate(q, x) + t


def rigid_inverse(q: jax.Array, t: jax.Array):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def rigid_compose(q2, t2, q1, t1):
    """(q2,t2) ∘ (q1,t1): apply (q1,t1) first."""
    return quat_mul(q2, q1), quat_rotate(q2, t1) + t2


def pose_center(q: jax.Array, t: jax.Array) -> jax.Array:
    """Projection center of a cam_from_world pose: -R^T t.

    Reference: glomap/math/rigid3d.h CenterFromPose.
    """
    return -quat_rotate(quat_conj(q), t)


def degrees(x):
    return x * (180.0 / jnp.pi)


def radians(x):
    return x * (jnp.pi / 180.0)


def average_quats(quats: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Chordal-L2 mean of unit quaternions (largest eigenvector of sum qq^T).

    Counterpart of colmap AverageQuaternions used by the reference rotation
    initializer (glomap/estimators/rotation_initializer.cc:7).
    """
    if weights is None:
        weights = jnp.ones(quats.shape[:-1], dtype=quats.dtype)
    M = jnp.einsum("...n,...ni,...nj->...ij", weights, quats, quats)
    _, vecs = jnp.linalg.eigh(M)
    return quat_normalize(vecs[..., -1])
