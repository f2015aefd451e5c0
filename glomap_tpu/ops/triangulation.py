"""Batched multi-view triangulation.

TPU-native counterpart of the colmap triangulation machinery used by the
reference's retriangulation stage (glomap/controllers/
track_retriangulation.cc:21-116, colmap IncrementalMapper::
TriangulateImage): every track is triangulated simultaneously by the
midpoint method — for observations with world ray directions d_o from
centers c_o, solve the 3x3 system
    [sum_o (I - d_o d_o^T)] X = sum_o (I - d_o d_o^T) c_o
assembled with segment-sums and solved with batched 3x3 linear solves.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.math import rotation as rotm
from glomap_tpu.scene.arrays import Scene, Tracks


@partial(jax.jit, static_argnames=("num_tracks",))
def midpoint_triangulate(obs_track, d, c, w, num_tracks: int):
    """obs_track (O,), d unit world directions (O,3), c centers (O,3),
    w per-obs weights (O,). Returns (X (T,3), ok (T,))."""
    dtype = d.dtype
    eye = jnp.eye(3, dtype=dtype)
    P = eye - d[:, :, None] * d[:, None, :]
    Pw = w[:, None, None] * P
    A = jax.ops.segment_sum(Pw, obs_track, num_segments=num_tracks)
    b = jax.ops.segment_sum(jnp.einsum("oij,oj->oi", Pw, c), obs_track,
                            num_segments=num_tracks)
    # regularize rank-deficient systems (collinear rays)
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    A_reg = A + (1e-10 * jnp.maximum(tr, 1e-12))[:, None, None] * eye
    X = jnp.linalg.solve(A_reg, b[..., None])[..., 0]
    # well-posedness: smallest eigenvalue of A not tiny vs trace
    evals = jnp.linalg.eigvalsh(A)
    ok = evals[:, 0] > 1e-6 * jnp.maximum(tr, 1e-12)
    return X, ok


def triangulate_tracks(scene: Scene, tracks: Tracks,
                       dtype=None) -> np.ndarray:
    """Fill tracks.xyz from current poses + rays; returns per-track
    well-posedness mask."""
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    if tracks.num_obs == 0:
        return np.zeros(0, dtype=bool)
    ob = tracks.obs_valid
    o_img = tracks.obs_image[ob]
    kp = scene.kp_offset[o_img] + tracks.obs_feature[ob]
    q_img, t_img = scene.image_cam_from_world()
    q = jnp.asarray(q_img[o_img], dtype=dtype)
    d = rotm.quat_rotate(rotm.quat_conj(q),
                         jnp.asarray(scene.kp_ray[kp], dtype=dtype))
    centers = scene.image_centers()[o_img]
    X, ok = midpoint_triangulate(
        jnp.asarray(tracks.obs_track[ob].astype(np.int32)), d,
        jnp.asarray(centers, dtype=dtype),
        jnp.ones(int(ob.sum()), dtype=dtype), tracks.num_tracks)
    X = np.asarray(X, dtype=np.float64)
    ok = np.array(ok, copy=True)
    tracks.xyz[:] = np.where(ok[:, None], X, tracks.xyz)
    return ok
