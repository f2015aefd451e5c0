"""Rotation averaging tests against synthetic ground truth.

Oracle mirrors the reference (rotation_averager_test.cc:86-107): compare
all pairwise relative rotations (gauge-free) between estimate and GT.
"""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.config import RotationEstimatorOptions
from glomap_tpu.estimators.rotation_averaging import estimate_rotations
from glomap_tpu.math import rotation as rotm
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def pairwise_rotation_errors_deg(q_est: np.ndarray, q_gt: np.ndarray):
    """Angles between est/GT relative rotations for all frame pairs."""
    qe = jnp.asarray(q_est)
    qg = jnp.asarray(q_gt)
    n = len(q_est)
    ii, jj = np.triu_indices(n, k=1)
    rel_e = rotm.quat_mul(qe[ii], rotm.quat_conj(qe[jj]))
    rel_g = rotm.quat_mul(qg[ii], rotm.quat_conj(qg[jj]))
    ang = rotm.relative_quat_angle_rad(rel_e, rel_g)
    return np.degrees(np.asarray(ang))


def _perturb_pairs(vg, rng, noise_deg=0.0, outlier_ratio=0.0):
    n = vg.num_pairs
    if noise_deg > 0:
        w = np.deg2rad(noise_deg) * rng.standard_normal((n, 3)) / np.sqrt(3)
        dq = np.asarray(rotm.so3_exp_quat(jnp.asarray(w)))
        vg.pair_quat = np.array(
            rotm.quat_mul(jnp.asarray(dq), jnp.asarray(vg.pair_quat)),
            copy=True)
    if outlier_ratio > 0:
        n_out = int(round(outlier_ratio * n))
        idx = rng.choice(n, size=n_out, replace=False)
        q = rng.standard_normal((n_out, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        vg.pair_quat[idx] = q


def test_noiseless_exact():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=150, seed=3))
    # scramble initial rotations so the test is meaningful
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    assert estimate_rotations(scene, vg)
    errs = pairwise_rotation_errors_deg(scene.frame_quat, gt["frame_quat"])
    assert errs.max() < 1e-4


def test_noisy_edges():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=20, num_points3D=200, seed=4))
    rng = np.random.default_rng(0)
    _perturb_pairs(vg, rng, noise_deg=2.0)
    assert estimate_rotations(scene, vg)
    errs = pairwise_rotation_errors_deg(scene.frame_quat, gt["frame_quat"])
    assert errs.mean() < 1.0
    assert errs.max() < 3.0


def test_noisy_edges_with_outliers():
    """Reference envelope: <=2 deg with noise + outliers
    (rotation_averager_test.cc:305)."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=25, num_points3D=250, seed=5))
    rng = np.random.default_rng(1)
    _perturb_pairs(vg, rng, noise_deg=1.0, outlier_ratio=0.15)
    assert estimate_rotations(scene, vg)
    errs = pairwise_rotation_errors_deg(scene.frame_quat, gt["frame_quat"])
    assert errs.mean() < 1.0
    assert errs.max() < 2.0


def test_rig_edges_map_to_frames():
    """Multi-camera rig: edges conjugated by sensor_from_rig still recover
    frame rotations exactly in the noiseless case."""
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_cameras_per_rig=2,
                         num_points3D=200, seed=6))
    scene.frame_quat = np.tile([1.0, 0, 0, 0], (scene.num_frames, 1))
    assert estimate_rotations(scene, vg)
    errs = pairwise_rotation_errors_deg(scene.frame_quat, gt["frame_quat"])
    assert errs.max() < 1e-4


def test_weighted_and_halfnorm_variants():
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=150, seed=7))
    rng = np.random.default_rng(2)
    _perturb_pairs(vg, rng, noise_deg=1.0, outlier_ratio=0.1)
    opts = RotationEstimatorOptions(use_weight=True, weight_type="HALF_NORM")
    assert estimate_rotations(scene, vg, opts)
    errs = pairwise_rotation_errors_deg(scene.frame_quat, gt["frame_quat"])
    assert errs.max() < 2.0


def test_cg_path_matches_dense():
    """Force the CG solver branch and compare against the dense branch."""
    import glomap_tpu.estimators.rotation_averaging as ra

    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=15, num_points3D=150, seed=8))
    rng = np.random.default_rng(3)
    _perturb_pairs(vg, rng, noise_deg=1.0)

    scene_dense = scene.copy()
    assert estimate_rotations(scene_dense, vg)

    old = ra._DENSE_MAX_NODES
    ra._DENSE_MAX_NODES = 0
    try:
        scene_cg = scene.copy()
        assert estimate_rotations(scene_cg, vg)
    finally:
        ra._DENSE_MAX_NODES = old

    errs = pairwise_rotation_errors_deg(scene_dense.frame_quat,
                                        scene_cg.frame_quat)
    assert errs.max() < 0.05


def _l1_objective(quats, fi, fj, q_rel, w):
    qe = rotm.quat_mul(rotm.quat_conj(jnp.asarray(quats)[fj]),
                       rotm.quat_mul(jnp.asarray(q_rel),
                                     jnp.asarray(quats)[fi]))
    e = np.asarray(rotm.quat_to_angle_axis(qe))
    return float(np.sum(np.abs(w[:, None] * e)))


def test_l1_admm_phase_minimizes_l1_objective():
    """The ADMM phase (reference SolveL1Regression counterpart) must reach
    an L1 objective at least as good as the IRLS-L1 fixed-point fallback,
    starting from the same MST initialization."""
    import glomap_tpu.estimators.rotation_averaging as ra

    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=20, num_points3D=200, seed=11))
    rng = np.random.default_rng(4)
    _perturb_pairs(vg, rng, noise_deg=1.0, outlier_ratio=0.3)

    fi, fj, q_rel, w = ra.build_frame_edges(scene, vg)
    quats0, root = ra._init_from_mst(scene.num_frames, fi, fj, q_rel, w)
    n = scene.num_frames
    ones = jnp.ones(len(fi))
    valid = jnp.ones(len(fi), dtype=bool)
    args = (jnp.asarray(quats0), jnp.asarray(fi), jnp.asarray(fj),
            jnp.asarray(q_rel), ones, valid, root)

    q_admm, it = ra._l1_admm_phase(*args, num_frames=n, max_outer=5,
                                   conv_thresh=1e-3)
    assert int(it) >= 1
    q_irls, _ = ra._irls_phase(*args, num_frames=n, max_iters=50,
                               weight_mode=ra.WEIGHT_L1, sigma_rad=0.1,
                               conv_thresh=1e-4, use_dense=True,
                               min_iters=10)
    w1 = np.ones(len(fi))
    obj_admm = _l1_objective(np.asarray(q_admm), fi, fj, q_rel, w1)
    obj_irls = _l1_objective(np.asarray(q_irls), fi, fj, q_rel, w1)
    obj_init = _l1_objective(quats0, fi, fj, q_rel, w1)
    assert obj_admm < obj_init
    assert obj_admm <= obj_irls * 1.05

    # and the rotations themselves are already in the right basin
    errs = pairwise_rotation_errors_deg(np.asarray(q_admm),
                                        gt["frame_quat"])
    assert errs.mean() < 2.0


def test_windowed_cg_matvec_matches_scatter():
    """The sorted-window PCG matvec (city-scale path) reproduces the
    scatter-add path bit-for-bit-ish on a local graph."""
    import jax.numpy as jnp
    import glomap_tpu.estimators.rotation_averaging as ra

    rng = np.random.default_rng(5)
    F, deg = 60, 6
    fi = np.repeat(np.arange(F), deg)
    fj = np.minimum(fi + rng.integers(1, 8, len(fi)), F - 1)
    keep = fi != fj
    fi, fj = fi[keep].astype(np.int32), fj[keep].astype(np.int32)
    q_gt = rng.standard_normal((F, 4))
    q_gt /= np.linalg.norm(q_gt, axis=1, keepdims=True)
    q_rel = np.asarray(rotm.quat_mul(q_gt[fj], rotm.quat_conj(q_gt[fi])))
    q0 = q_gt + 0.05 * rng.standard_normal((F, 4))
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)

    E = len(fi)
    args = (jnp.asarray(q0), jnp.asarray(fi), jnp.asarray(fj),
            jnp.asarray(q_rel), jnp.ones(E), jnp.ones(E, bool), 0, F)
    kw = dict(max_iters=8, weight_mode=ra.WEIGHT_GEMAN_MCCLURE,
              sigma_rad=np.deg2rad(5.0), conv_thresh=0.0,
              use_dense=False, min_iters=8)
    q_scatter, _ = ra._irls_phase(*args, **kw)

    sops = ra.build_sorted_edge_ops(fi, fj)
    assert sops is not None and sops["src_width"] > 0
    sops_d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in sops.items()}
    q_win, _ = ra._irls_phase(*args, **kw, **sops_d)

    errs = pairwise_rotation_errors_deg(np.asarray(q_scatter),
                                        np.asarray(q_win))
    assert errs.max() < 1e-5
