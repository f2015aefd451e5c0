"""Gravity alignment math.

Counterpart of glomap/math/gravity.{h,cc}: gravity -> alignment rotation
(second column = gravity, Householder completion), 1-DoF up-rotation
angle <-> matrix, SVD-based gravity averaging.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm


def align_rot(gravity: np.ndarray) -> np.ndarray:
    """(..., 3) gravity -> (..., 3, 3) rotation with column 1 = gravity.

    Matches GetAlignRot (gravity.cc:11-25): remaining columns from the
    Householder complement, sign-fixed to det +1.
    """
    g = np.atleast_2d(np.asarray(gravity, dtype=np.float64))
    n = len(g)
    out = np.zeros((n, 3, 3))
    for k in range(n):
        v = g[k] / np.linalg.norm(g[k])
        # Householder complement of v (same as Eigen householderQr on a
        # 3x1 matrix): Q = I - 2 w w^T with w from the Householder vector
        e = np.zeros(3)
        e[0] = 1.0
        alpha = -np.sign(v[0]) if v[0] != 0 else -1.0
        w = v - alpha * e
        wn = np.linalg.norm(w)
        if wn < 1e-12:
            Q = np.eye(3)
        else:
            w = w / wn
            Q = np.eye(3) - 2.0 * np.outer(w, w)
        # columns 1, 2 of Q span the complement of v
        R = np.zeros((3, 3))
        R[:, 1] = v
        R[:, 0] = Q[:, 1]
        R[:, 2] = Q[:, 2]
        if np.linalg.det(R) < 0:
            R[:, 2] = -R[:, 2]
        out[k] = R
    return out[0] if np.asarray(gravity).ndim == 1 else out


def rot_up_to_angle(R_up: np.ndarray) -> float:
    """Y-angle of an (approximately) up-axis rotation (RotUpToAngle)."""
    aa = np.asarray(rotm.so3_log(np.asarray(R_up)))
    return float(aa[..., 1]) if aa.ndim == 1 else aa[..., 1]


def angle_to_rot_up(angle) -> np.ndarray:
    a = np.zeros(np.shape(angle) + (3,))
    a[..., 1] = angle
    return np.asarray(rotm.so3_exp(a))


def closest_up_angle(R_align: np.ndarray, R: np.ndarray):
    """theta minimizing the geodesic distance R ~ R_align @ R_up(theta):
    from M = R_align^T R, theta = atan2(M02 - M20, M00 + M22)."""
    M = np.swapaxes(R_align, -1, -2) @ R
    return np.arctan2(M[..., 0, 2] - M[..., 2, 0],
                      M[..., 0, 0] + M[..., 2, 2])


def average_gravity(gravities: np.ndarray) -> np.ndarray:
    """Principal direction of a set of (N, 3) gravity vectors with sign
    majority vote (AverageGravity, gravity.cc:37-95)."""
    g = np.asarray(gravities, dtype=np.float64)
    if len(g) == 0:
        return np.zeros(3)
    A = g.T @ g / len(g)
    _, vecs = np.linalg.eigh(A)
    avg = vecs[:, -1]
    if (g @ avg < 0).sum() > len(g) / 2:
        avg = -avg
    return avg


def gravity_angle_deg(g1, g2):
    c = np.sum(g1 * g2, axis=-1) / np.maximum(
        np.linalg.norm(g1, axis=-1) * np.linalg.norm(g2, axis=-1), 1e-12)
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
