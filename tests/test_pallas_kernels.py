"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference paths."""

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.math import two_view as tv
from glomap_tpu.ops import pallas_kernels as pk


def _random_pinhole_obs(n, seed=0, distortion=False):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qs = rng.standard_normal((n, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    ft = rng.standard_normal((n, 3))
    st = 0.1 * rng.standard_normal((n, 3))
    cpar = np.zeros((n, 16))
    cpar[:, 0] = 500 + rng.uniform(0, 50, n)
    cpar[:, 1] = 500 + rng.uniform(0, 50, n)
    cpar[:, 2] = 320
    cpar[:, 3] = 240
    if distortion:
        # realistic magnitudes: radial/rational + tangential + prism
        cpar[:, 4:8] = 0.05 * rng.standard_normal((n, 4))    # k1..k4
        cpar[:, 8:11] = 0.02 * rng.standard_normal((n, 3))   # d1..d3
        cpar[:, 11:13] = 0.01 * rng.standard_normal((n, 2))  # p1, p2
        cpar[:, 13:15] = 0.01 * rng.standard_normal((n, 2))  # sx1, sy1
    X = rng.standard_normal((n, 3)) * 2
    # place points in front: X chosen, then ensure depth positive by
    # shifting along the camera z axis via translation
    uv = rng.uniform(0, 640, (n, 2))
    return q, ft, qs, st, cpar, X, uv


def _check_kernel_vs_autodiff(n, seed, distortion):
    from glomap_tpu.estimators.bundle_adjustment import _resid_and_jac_v

    q, ft, qs, st, cpar, X, uv = _random_pinhole_obs(
        n, seed=seed, distortion=distortion)
    kind = jnp.zeros(n, dtype=jnp.int32)
    T = jnp.broadcast_to(jnp.eye(16), (n, 16, 16))

    r_ref, J_ref = _resid_and_jac_v(
        jnp.asarray(q), jnp.asarray(ft), jnp.asarray(qs), jnp.asarray(st),
        jnp.asarray(cpar), kind, jnp.asarray(X), jnp.asarray(uv), T, 25)

    r_k, J_k = pk.ba_resid_jac_pinhole(
        jnp.asarray(q), jnp.asarray(ft), jnp.asarray(qs), jnp.asarray(st),
        jnp.asarray(cpar), jnp.asarray(X), jnp.asarray(uv), interpret=True)

    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_ref),
                               rtol=1e-7, atol=1e-7)


def test_pinhole_resid_jac_matches_autodiff():
    _check_kernel_vs_autodiff(300, seed=0, distortion=False)


def test_perspective_distortion_jac_matches_autodiff():
    """Full polynomial model: rational radial + tangential + thin prism."""
    _check_kernel_vs_autodiff(300, seed=7, distortion=True)


def _check_kind_kernel_vs_autodiff(n, seed, kinds, distortion=True,
                                   omega=0.9):
    """All-kind projection kernel vs the vmapped-jacfwd reference."""
    from glomap_tpu.estimators.bundle_adjustment import _resid_and_jac_v

    q, ft, qs, st, cpar, X, uv = _random_pinhole_obs(
        n, seed=seed, distortion=distortion)
    rng = np.random.default_rng(seed + 1)
    kind = jnp.asarray(rng.choice(kinds, n).astype(np.int32))
    cpar[:, 15] = omega  # FOV omega (ignored by other kinds)
    if distortion:
        # fisheye uses the theta-polynomial slots only (like colmap)
        cpar[:, 8:11] = 0.0
        cpar[:, 11:15] *= 0.1
    T = jnp.broadcast_to(jnp.eye(16), (n, 16, 16))

    r_ref, J_ref = _resid_and_jac_v(
        jnp.asarray(q), jnp.asarray(ft), jnp.asarray(qs), jnp.asarray(st),
        jnp.asarray(cpar), kind, jnp.asarray(X), jnp.asarray(uv), T, 25)

    r_k, J_k = pk.ba_resid_jac_gathered(
        jnp.asarray(q), jnp.asarray(ft), jnp.asarray(qs), jnp.asarray(st),
        jnp.asarray(cpar), kind, jnp.asarray(X), jnp.asarray(uv),
        interpret=True)

    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_ref),
                               rtol=1e-6, atol=1e-6)


def test_fisheye_resid_jac_matches_autodiff():
    """Kind-1 (equidistant fisheye: OPENCV_FISHEYE / *_FISHEYE models)."""
    _check_kind_kernel_vs_autodiff(300, seed=3, kinds=[1])


def test_fov_resid_jac_matches_autodiff():
    """Kind-2 (FOV model) including the omega intrinsic column."""
    _check_kind_kernel_vs_autodiff(300, seed=4, kinds=[2])


def test_mixed_kind_resid_jac_matches_autodiff():
    """Mixed perspective + fisheye + FOV batch in ONE fused sweep."""
    _check_kind_kernel_vs_autodiff(512, seed=5, kinds=[0, 1, 2])


def test_rig_sensor_columns_match_autodiff():
    """zdim=31 kernel variant: the sensor-pose columns [ws(3) dts(3)]
    (optimize_rig) match the jacfwd reference."""
    from glomap_tpu.estimators.bundle_adjustment import _resid_and_jac_v
    from glomap_tpu.math import rotation as rotm

    n = 256
    q, ft, qs, st, cpar, X, uv = _random_pinhole_obs(n, seed=9,
                                                     distortion=True)
    kind = jnp.zeros(n, dtype=jnp.int32)
    T16 = jnp.broadcast_to(jnp.eye(16), (n, 16, 16))
    r_ref, J_ref = _resid_and_jac_v(
        jnp.asarray(q), jnp.asarray(ft), jnp.asarray(qs), jnp.asarray(st),
        jnp.asarray(cpar), kind, jnp.asarray(X), jnp.asarray(uv), T16, 31)

    Rf = rotm.quat_to_rotmat(jnp.asarray(q))
    Rs = rotm.quat_to_rotmat(jnp.asarray(qs))
    M = Rs @ Rf
    b = jnp.einsum("oij,oj->oi", Rs, jnp.asarray(ft)) + jnp.asarray(st)
    pad = (-n) % 128

    def T(a, k):
        a2 = jnp.asarray(a).reshape(n, k).T
        return jnp.pad(a2, ((0, 0), (0, pad))) if pad else a2

    r_t, J_t = pk.projection_resid_jac(
        T(M, 9), T(Rs, 9), T(b, 3), T(X, 3), T(uv, 2),
        T(cpar[:, 0:16], 16), T(np.zeros(n), 1), tsrow=T(st, 3),
        interpret=True)
    r_k = r_t[:, :n].T
    Jf = J_t[:, :n].T  # (O, 62)
    J_k = jnp.stack([Jf[:, 0:31], Jf[:, 31:62]], axis=1)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_ref),
                               rtol=1e-6, atol=1e-6)


def test_huber_weight_cost_matches():
    from glomap_tpu.estimators.bundle_adjustment import (_huber_cost,
                                                         _huber_weight)
    rng = np.random.default_rng(1)
    r2 = jnp.asarray(rng.uniform(0, 5, 1000))
    w, c = pk.huber_weight_cost(r2, delta=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(w),
                               np.asarray(_huber_weight(r2, 1.0)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c),
                               np.asarray(_huber_cost(r2, 1.0)), rtol=1e-12)


def test_sampson_score_matches():
    rng = np.random.default_rng(2)
    m = 500
    E = rng.standard_normal((m, 3, 3))
    x1 = rng.standard_normal((m, 3))
    x2 = rng.standard_normal((m, 3))
    x1[:, 2] = np.abs(x1[:, 2]) + 0.5
    x2[:, 2] = np.abs(x2[:, 2]) + 0.5

    ref = np.asarray(tv.sampson_error_sq(jnp.asarray(E), jnp.asarray(x1),
                                         jnp.asarray(x2)))
    pad = (-m) % 128
    E_rows = jnp.asarray(np.pad(E.reshape(m, 9).T, ((0, 0), (0, pad))))
    x1_rows = jnp.asarray(np.pad(x1.T, ((0, 0), (0, pad))))
    x2_rows = jnp.asarray(np.pad(x2.T, ((0, 0), (0, pad))))
    out = np.asarray(pk.sampson_score(E_rows, x1_rows, x2_rows,
                                      interpret=True))[:m]
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-12)


def test_sorted_segment_rowsum_matches_segment_sum():
    rng = np.random.default_rng(3)
    for n, t, k, block in [(5000, 400, 9, 512), (2048, 2048, 3, 2048),
                           (100, 7, 16, 256)]:
        ids = np.sort(rng.integers(0, t, size=n)).astype(np.int32)
        vals = rng.standard_normal((k, n))
        ref = np.zeros((t, k))
        np.add.at(ref, ids, vals.T)
        width = pk.block_width_for_sorted(ids, block=block)
        out = np.asarray(pk.sorted_segment_rowsum(
            jnp.asarray(vals), jnp.asarray(ids), t, width, block=block,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)


def test_sorted_segment_rowsum_empty_segments_and_tail():
    # segments with no observations stay zero; non-multiple-of-block tail
    ids = np.asarray([0, 0, 5, 5, 5, 9], dtype=np.int32)
    vals = np.arange(12, dtype=np.float64).reshape(2, 6)
    ref = np.zeros((11, 2))
    np.add.at(ref, ids, vals.T)
    width = pk.block_width_for_sorted(ids, block=256)
    out = np.asarray(pk.sorted_segment_rowsum(
        jnp.asarray(vals), jnp.asarray(ids), 11, width, block=256,
        interpret=True))
    np.testing.assert_allclose(out, ref)


def test_sorted_segment_pair_rowsum_matches_composition():
    """Fused pair-product reduction == stack + sorted_segment_rowsum."""
    rng = np.random.default_rng(11)
    n, t, block = 3000, 250, 512
    ids = np.sort(rng.integers(0, t, size=n)).astype(np.int32)
    width = pk.block_width_for_sorted(ids, block=block)
    for ku, kv, pairs in [
        # J^T y: rows[i] = U[i]*V[0] + U[6+i]*V[1]
        (12, 2, tuple(((i, 0), (6 + i, 1)) for i in range(6))),
        # Gram 3x3: rows[i*3+j] = U[i]*V[j] + U[3+i]*V[3+j]
        (6, 6, tuple(((i, j), (3 + i, 3 + j))
                     for i in range(3) for j in range(3))),
        # triple-term contraction (Schur correction pattern)
        (9, 9, tuple(tuple((i * 3 + m, l * 3 + m) for m in range(3))
                     for i in range(3) for l in range(3))),
    ]:
        U = rng.standard_normal((ku, n))
        V = rng.standard_normal((kv, n))
        rows = np.stack([sum(U[a] * V[b] for a, b in terms)
                         for terms in pairs])
        ref = np.zeros((t, len(pairs)))
        np.add.at(ref, ids, rows.T)
        out = np.asarray(pk.sorted_segment_pair_rowsum(
            jnp.asarray(U), jnp.asarray(V), pairs, jnp.asarray(ids), t,
            width, block=block, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)


def test_sorted_segment_gather_dot_matches_composition():
    """Fused J * gather(v) == sorted_segment_gather + einsum."""
    rng = np.random.default_rng(12)
    n, t, block = 3000, 250, 512
    ids = np.sort(rng.integers(0, t, size=n)).astype(np.int32)
    width = pk.block_width_for_sorted(ids, block=block)
    for k, nr in [(6, 2), (3, 2), (16, 2)]:
        tab = rng.standard_normal((t, k))
        U = rng.standard_normal((nr * k, n))
        ref = np.einsum("rko,ko->ro", U.reshape(nr, k, n), tab[ids].T)
        out = np.asarray(pk.sorted_segment_gather_dot(
            jnp.asarray(tab), jnp.asarray(ids), jnp.asarray(U), width,
            block=block, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)


def test_ba_point_width_path_matches_default():
    """_solve_ba with the sorted-point Pallas reducer == scatter path."""
    import jax
    from glomap_tpu.estimators import bundle_adjustment as ba
    from glomap_tpu.parallel.sharded_ba import build_ba_inputs
    from glomap_tpu.processors.undistortion import undistort_images
    from glomap_tpu.controllers.track_establishment import (
        establish_full_tracks, find_tracks_for_problem)
    from glomap_tpu.ops.triangulation import triangulate_tracks
    from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset

    scene, vg, _ = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=8, num_points3D=60, seed=3, point2D_stddev=0.5))
    undistort_images(scene)
    tracks = find_tracks_for_problem(scene, establish_full_tracks(scene, vg))
    triangulate_tracks(scene, tracks)
    params, obs, statics = build_ba_inputs(scene, tracks,
                                           dtype=jnp.float64,
                                           locality_order=True)
    assert statics["point_width"] > 0
    assert statics["frame_width"] > 0
    statics["max_iters"] = 3

    def run(pw):
        s = dict(statics)
        s["point_width"] = pw
        s["one_hot_budget"] = 0  # force scatter/pallas, not one-hot
        return ba._solve_ba(
            jnp.asarray(params["frame_quat"]),
            jnp.asarray(params["frame_trans"]),
            jnp.asarray(params["cam_params"]), jnp.asarray(params["points"]),
            jnp.asarray(obs["o_frame"]), jnp.asarray(obs["o_cam"]),
            jnp.asarray(obs["o_point"]), jnp.asarray(obs["o_sensor_q"]),
            jnp.asarray(obs["o_sensor_t"]), jnp.asarray(obs["o_kind"]),
            jnp.asarray(obs["o_uv"]), jnp.asarray(params["cam_T"]),
            jnp.asarray(obs["o_w"]), jnp.asarray(params["frame_mask"]), **s)

    out_def = run(0)
    out_pw = run(statics["point_width"])
    for a, b in zip(out_def[:4], out_pw[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_windowed_segment_kernels_unsorted_within_block():
    """The kernels only need bounded per-block windows, not sortedness —
    the frame axis after locality ordering is exactly this case."""
    rng = np.random.default_rng(7)
    n, t, k, block = 4096, 300, 6, 512
    # ids wander inside a sliding window (unsorted within blocks)
    base = np.repeat(np.arange(0, t - 40, (t - 40) // (n // block + 1) + 1),
                     block)[:n]
    ids = (base + rng.integers(0, 40, n)).astype(np.int32)
    vals = rng.standard_normal((k, n))
    width = pk.block_width_for_sorted(ids, block=block)
    assert width < t
    ref = np.zeros((t, k))
    np.add.at(ref, ids, vals.T)
    out = np.asarray(pk.sorted_segment_rowsum(
        jnp.asarray(vals), jnp.asarray(ids), t, width, block=block,
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)

    tab = rng.standard_normal((t, k))
    g = np.asarray(pk.sorted_segment_gather(
        jnp.asarray(tab), jnp.asarray(ids), width, block=block,
        interpret=True))
    np.testing.assert_allclose(g, tab[ids].T, rtol=1e-12)


def test_order_obs_for_locality_roundtrip():
    from glomap_tpu.estimators.bundle_adjustment import (
        _axis_window, order_obs_for_locality)
    rng = np.random.default_rng(8)
    T, F = 500, 200
    lens = rng.integers(3, 12, T)
    o_point = np.repeat(np.arange(T, dtype=np.int32), lens)
    f0 = rng.integers(0, F - 12, T)
    o_frame = (np.repeat(f0, lens) +
               rng.integers(0, 12, len(o_point))).astype(np.int32)
    perm, point_perm, new_of_old = order_obs_for_locality(
        o_frame, o_point, T)
    op = new_of_old[o_point[perm]]
    assert np.all(np.diff(op) >= 0)          # point axis sorted
    assert _axis_window(o_frame[perm].astype(np.int32), cap=4096) <= 256
    # inverse mapping: X_old == X_new[new_of_old]
    X_old = rng.standard_normal((T, 3))
    X_new = X_old[point_perm]
    np.testing.assert_array_equal(X_new[new_of_old], X_old)


def test_segment_ids_from_offsets_matches_searchsorted():
    # the cumsum form replaced jnp.searchsorted in the inlier sweep
    # (836 -> 27 ms at 8.3M rows on v5e); exact equivalence including
    # empty leading / middle / trailing segments
    from glomap_tpu.ops.segment_ops import segment_ids_from_offsets
    rng = np.random.default_rng(0)
    for _ in range(20):
        P = int(rng.integers(1, 12))
        counts = rng.integers(0, 6, P)
        # force some empty patterns
        if P >= 3:
            counts[0] = 0 if rng.random() < 0.5 else counts[0]
            counts[-1] = 0 if rng.random() < 0.5 else counts[-1]
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        n = int(offsets[-1])
        want = np.searchsorted(offsets[1:], np.arange(n), side="right")
        got = np.asarray(segment_ids_from_offsets(jnp.asarray(offsets), n))
        np.testing.assert_array_equal(got, want)
        # bucket-padded row count: padding rows must map OUT of range
        # (id >= P, dropped by segment reductions) exactly like
        # searchsorted — never folded into the last real segment
        n_pad = n + int(rng.integers(1, 5))
        want = np.searchsorted(offsets[1:], np.arange(n_pad), side="right")
        got = np.asarray(
            segment_ids_from_offsets(jnp.asarray(offsets), n_pad))
        np.testing.assert_array_equal(np.minimum(got, P), np.minimum(want, P))


def test_accum_postlude_rmw_variant_matches(monkeypatch):
    """Force the big-table HBM read-modify-write accumulator (normally
    chosen only above _VMEM_TABLE_BYTES, so CPU interpret tests would
    otherwise only ever exercise the VMEM-resident variant) and assert
    both rowsum kernels match the reference on sorted ids with empty
    segments and a ragged tail."""
    monkeypatch.setattr(pk, "_VMEM_TABLE_BYTES", 0)
    rng = np.random.default_rng(9)
    n, t, k, block = 5000, 400, 9, 512
    ids = np.sort(rng.integers(0, t, size=n)).astype(np.int32)
    vals = rng.standard_normal((k, n))
    ref = np.zeros((t, k))
    np.add.at(ref, ids, vals.T)
    width = pk.block_width_for_sorted(ids, block=block)
    out = np.asarray(pk.sorted_segment_rowsum(
        jnp.asarray(vals), jnp.asarray(ids), t, width, block=block,
        interpret=True, exact=True))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)
    # pair-product variant through the same RMW path
    U = rng.standard_normal((2, n))
    V = rng.standard_normal((3, n))
    pairs = (((0, 0),), ((0, 1), (1, 2)))
    ref2 = np.zeros((t, len(pairs)))
    prod = np.stack([sum(U[a] * V[b] for a, b in terms)
                     for terms in pairs])
    np.add.at(ref2, ids, prod.T)
    out2 = np.asarray(pk.sorted_segment_pair_rowsum(
        jnp.asarray(U), jnp.asarray(V), pairs, jnp.asarray(ids), t,
        width, block=block, interpret=True))
    np.testing.assert_allclose(out2, ref2, rtol=1e-6, atol=1e-8)
