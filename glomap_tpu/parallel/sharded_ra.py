"""Distributed rotation averaging over a device mesh.

Counterpart scale-out of glomap/estimators/global_rotation_averaging.cc —
the reference is single-host CHOLMOD; here the IRLS solver's big axis is
view-graph EDGES, and every edge enters the iteration only through
gather -> elementwise -> scatter-add chains (residuals, weights, rhs,
Laplacian matvec). Sharding the edge arrays on an "obs" mesh axis and
replicating the (F, 4) quaternion block lets XLA's SPMD partitioner run
each sweep locally per device with one AllReduce (psum over ICI) per
reduction — the same design as parallel/sharded_ba.py, with zero change
to the solver itself (estimators/rotation_averaging._irls_phase).

The dense-Cholesky small-graph path is skipped: the CG matvec
(O(E) gathers + segment sums) is the form that partitions; dense (F, F)
assembly would replicate a scatter-add of every edge into one matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import RotationEstimatorOptions
from glomap_tpu.estimators.rotation_averaging import (
    WEIGHT_GEMAN_MCCLURE, WEIGHT_HALF_NORM, WEIGHT_L1,
    _init_from_mst, _irls_phase, build_frame_edges)
from glomap_tpu.math import rotation as rotm
from glomap_tpu.parallel import mesh as meshmod
from glomap_tpu.utils.padding import bucket_size, pad_axis0


def solve_rotations_sharded(scene, view_graph, mesh=None,
                            opts: RotationEstimatorOptions | None = None,
                            dtype=None, pair_mask=None) -> bool:
    """estimate_rotations with the edge axis sharded across the mesh.

    Writes scene.frame_quat; returns False on empty/failed input (same
    contract as estimators.rotation_averaging.estimate_rotations).
    """
    opts = opts or RotationEstimatorOptions()
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    mesh = mesh or meshmod.make_mesh()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    fi, fj, q_rel, w_edge = build_frame_edges(scene, view_graph, pair_mask)
    num_frames = scene.num_frames
    if len(fi) == 0 or num_frames == 0:
        return False
    base_w = w_edge if opts.use_weight else np.ones_like(w_edge)

    if opts.skip_initialization:
        quats0 = scene.frame_quat.copy()
        deg = np.bincount(fi, minlength=num_frames) + \
            np.bincount(fj, minlength=num_frames)
        root = int(np.argmax(deg))
    else:
        quats0, root = _init_from_mst(num_frames, fi, fj, q_rel, w_edge)

    grav_mask_d = None
    if opts.use_gravity and scene.frame_has_gravity.any():
        from glomap_tpu.math import gravity as gravm
        g_idx = np.nonzero(scene.frame_has_gravity)[0]
        R_align = gravm.align_rot(scene.frame_gravity[g_idx])
        if R_align.ndim == 2:
            R_align = R_align[None]
        R0 = rotm.quat_to_rotmat(quats0[g_idx])
        theta = gravm.closest_up_angle(R_align, R0)
        R_snap = R_align @ gravm.angle_to_rot_up(theta)
        quats0 = quats0.copy()
        quats0[g_idx] = rotm.rotmat_to_quat(R_snap)
        gm = np.zeros(num_frames)
        gm[g_idx] = 1.0
        grav_mask_d = meshmod.replicate(mesh, jnp.asarray(gm, dtype=dtype))

    # pad the edge axis: bucket (compile-cache reuse across filter rounds)
    # AND a multiple of the device count (even shards)
    n_edge = len(fi)
    n_pad = bucket_size(n_edge, 128 * n_dev)
    valid = pad_axis0(np.ones(n_edge, dtype=bool), n_pad, fill=False)
    q_rel_p = pad_axis0(np.asarray(q_rel), n_pad).copy()
    q_rel_p[n_edge:, 0] = 1.0

    shard = lambda a: meshmod.shard_obs(mesh, a)
    fi_d = shard(pad_axis0(fi, n_pad))
    fj_d = shard(pad_axis0(fj, n_pad))
    q_rel_d = shard(jnp.asarray(q_rel_p, dtype=dtype))
    base_w_d = shard(jnp.asarray(pad_axis0(base_w, n_pad), dtype=dtype))
    valid_d = shard(valid)
    quats = meshmod.replicate(mesh, jnp.asarray(quats0, dtype=dtype))

    sigma_rad = float(np.deg2rad(opts.irls_loss_parameter_sigma))
    weight_mode = (WEIGHT_GEMAN_MCCLURE
                   if opts.weight_type == "GEMAN_MCCLURE" else
                   WEIGHT_HALF_NORM)

    quats, _ = _irls_phase(
        quats, fi_d, fj_d, q_rel_d, base_w_d, valid_d, root, num_frames,
        max_iters=max(10 * opts.max_num_l1_iterations, 50),
        weight_mode=WEIGHT_L1, sigma_rad=sigma_rad,
        conv_thresh=0.1 * opts.l1_step_convergence_threshold,
        use_dense=False, min_iters=10, grav_mask=grav_mask_d)
    quats, _ = _irls_phase(
        quats, fi_d, fj_d, q_rel_d, base_w_d, valid_d, root, num_frames,
        max_iters=opts.max_num_irls_iterations, weight_mode=weight_mode,
        sigma_rad=sigma_rad,
        conv_thresh=opts.irls_step_convergence_threshold,
        use_dense=False, grav_mask=grav_mask_d)

    q_final = np.asarray(rotm.quat_normalize(quats), dtype=np.float64)
    if not np.all(np.isfinite(q_final)):
        return False
    scene.frame_quat[:] = q_final
    return True
