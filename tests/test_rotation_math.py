"""Unit tests for batched rotation math (glomap_tpu/math/rotation.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from glomap_tpu.math import rotation as rot


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q


def test_quat_rotmat_roundtrip():
    q = random_quats(256)
    R = rot.quat_to_rotmat(jnp.asarray(q))
    q2 = rot.rotmat_to_quat(R)
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_quat_to_rotmat_matches_scipy():
    q = random_quats(64, seed=1)
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    R_ref = ScipyRot.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_rotmat_to_quat_near_pi():
    # Rotations by ~pi around each axis stress the trace-based branch.
    for axis in np.eye(3):
        for ang in [np.pi - 1e-7, np.pi, np.pi - 1e-3]:
            R_ref = ScipyRot.from_rotvec(ang * axis).as_matrix()
            q = np.asarray(rot.rotmat_to_quat(jnp.asarray(R_ref)))
            R_back = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
            np.testing.assert_allclose(R_back, R_ref, atol=1e-9)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(128, 3))
    w *= (rng.uniform(0, np.pi - 1e-3, size=(128, 1)) /
          np.linalg.norm(w, axis=-1, keepdims=True))
    w_back = np.asarray(rot.so3_log(rot.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w_back, w, atol=1e-9)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-12, 0, 0], [0.0, 0, 0], [1e-8, 1e-8, 0]])
    R = np.asarray(rot.so3_exp(w))
    for i in range(3):
        R_ref = ScipyRot.from_rotvec(np.array(w[i], copy=True)).as_matrix()
        np.testing.assert_allclose(R[i], R_ref, atol=1e-12)


def test_quat_mul_compose():
    qa, qb = random_quats(32, 3), random_quats(32, 4)
    Rab = np.asarray(rot.quat_to_rotmat(rot.quat_mul(jnp.asarray(qa), jnp.asarray(qb))))
    R_ref = np.asarray(rot.quat_to_rotmat(jnp.asarray(qa))) @ \
        np.asarray(rot.quat_to_rotmat(jnp.asarray(qb)))
    np.testing.assert_allclose(Rab, R_ref, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q = random_quats(32, 5)
    rng = np.random.default_rng(6)
    v = rng.normal(size=(32, 3))
    out = np.asarray(rot.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    ref = np.einsum("nij,nj->ni", np.asarray(rot.quat_to_rotmat(jnp.asarray(q))), v)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_rigid_compose_inverse():
    q = random_quats(16, 7)
    rng = np.random.default_rng(8)
    t = rng.normal(size=(16, 3))
    qi, ti = rot.rigid_inverse(jnp.asarray(q), jnp.asarray(t))
    qc, tc = rot.rigid_compose(jnp.asarray(q), jnp.asarray(t), qi, ti)
    np.testing.assert_allclose(np.asarray(rot.quat_angle_rad(qc)), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-9)


def test_pose_center():
    q = random_quats(8, 9)
    rng = np.random.default_rng(10)
    c_ref = rng.normal(size=(8, 3))
    # t = -R c
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
    t = -np.einsum("nij,nj->ni", R, c_ref)
    c = np.asarray(rot.pose_center(jnp.asarray(q), jnp.asarray(t)))
    np.testing.assert_allclose(c, c_ref, atol=1e-12)


def test_average_quats():
    base = random_quats(1, 11)[0]
    rng = np.random.default_rng(12)
    perturbs = 0.01 * rng.normal(size=(50, 3))
    qs = np.asarray(rot.quat_mul(jnp.asarray(base)[None],
                                 rot.so3_exp_quat(jnp.asarray(perturbs))))
    q_avg = np.asarray(rot.average_quats(jnp.asarray(qs)))
    ang = np.asarray(rot.relative_quat_angle_rad(jnp.asarray(q_avg), jnp.asarray(base)))
    assert ang < 0.005


def test_jit_and_grad():
    f = jax.jit(lambda w: jnp.sum(rot.so3_exp(w)))
    g = jax.grad(f)(jnp.asarray([0.1, 0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
    # grad through log(exp) near identity
    h = jax.grad(lambda w: jnp.sum(rot.so3_log(rot.so3_exp(w)) ** 2))(
        jnp.asarray([1e-3, -2e-3, 5e-4]))
    np.testing.assert_allclose(np.asarray(h),
                               2 * np.asarray([1e-3, -2e-3, 5e-4]), atol=1e-8)
