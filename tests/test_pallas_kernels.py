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
