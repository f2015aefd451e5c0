"""View-graph calibration: per-camera focal estimation from F matrices.

Counterpart of glomap/estimators/view_graph_calibration.{h,cc}
(ViewGraphCalibrator) with the Fetzer focal-length costs of
glomap/estimators/cost_function.h:150-310: per pair, the SVD of
G = K1'^T F K0' (K' = principal point only) yields coefficient vectors
d_01/d_12; the residuals
    r0 = (fi^2 - K0_01(fj)) / fi^2,   r1 = (fj^2 - K1_12(fi)) / fj^2
are minimized over the unknown focals under a Cauchy loss (1e-2).
Cameras with prior focals stay constant; estimates outside
[0.1x, 10x] of the prior are rejected; pairs with converged residual
norm > thres_two_view_error are invalidated (view_graph_calibration.cc
:108-186).

TPU design: the d-coefficients are a one-shot batched 3x3 SVD; each LM
iteration is a vmapped residual/Jacobian evaluation + scatter into a
dense C x C normal system (C = #cameras, tiny) — one jitted while_loop.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from glomap_tpu.config import ViewGraphCalibratorOptions
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import (ViewGraph, CONFIG_CALIBRATED,
                                         CONFIG_UNCALIBRATED)


def _fetzer_d(ai, bi, aj, bj, u, v):
    return jnp.stack([
        ai[..., u] * aj[..., v] - ai[..., v] * aj[..., u],
        ai[..., u] * bj[..., v] - ai[..., v] * bj[..., u],
        bi[..., u] * aj[..., v] - bi[..., v] * aj[..., u],
        bi[..., u] * bj[..., v] - bi[..., v] * bj[..., u],
    ], axis=-1)


def fetzer_coefficients(G: jax.Array):
    """Batched (P, 3, 3) G -> (d_01, d_12) each (P, 4).

    Mirrors fetzer_ds (cost_function.h:157-196)."""
    U, s, Vt = jnp.linalg.svd(G)
    V = jnp.swapaxes(Vt, -1, -2)
    v0, v1 = V[..., :, 0], V[..., :, 1]
    u0, u1 = U[..., :, 0], U[..., :, 1]
    s0, s1 = s[..., 0], s[..., 1]

    ai = jnp.stack([
        s0 * s0 * (v0[..., 0] ** 2 + v0[..., 1] ** 2),
        s0 * s1 * (v0[..., 0] * v1[..., 0] + v0[..., 1] * v1[..., 1]),
        s1 * s1 * (v1[..., 0] ** 2 + v1[..., 1] ** 2),
    ], axis=-1)
    aj = jnp.stack([
        u1[..., 0] ** 2 + u1[..., 1] ** 2,
        -(u0[..., 0] * u1[..., 0] + u0[..., 1] * u1[..., 1]),
        u0[..., 0] ** 2 + u0[..., 1] ** 2,
    ], axis=-1)
    bi = jnp.stack([
        s0 * s0 * v0[..., 2] ** 2,
        s0 * s1 * v0[..., 2] * v1[..., 2],
        s1 * s1 * v1[..., 2] ** 2,
    ], axis=-1)
    bj = jnp.stack([
        u1[..., 2] ** 2,
        -(u0[..., 2] * u1[..., 2]),
        u0[..., 2] ** 2,
    ], axis=-1)
    d01 = _fetzer_d(ai, bi, aj, bj, 1, 0)
    d12 = _fetzer_d(ai, bi, aj, bj, 2, 1)
    return d01, d12


def _pair_residuals(fi, fj, d01, d12):
    di = fj * fj * d01[..., 0] + d01[..., 1]
    dj = fi * fi * d12[..., 0] + d12[..., 2]
    di = jnp.where(di == 0, 1e-6, di)
    dj = jnp.where(dj == 0, 1e-6, dj)
    K0_01 = -(fj * fj * d01[..., 2] + d01[..., 3]) / di
    K1_12 = -(fi * fi * d12[..., 1] + d12[..., 3]) / dj
    r0 = (fi * fi - K0_01) / (fi * fi)
    r1 = (fj * fj - K1_12) / (fj * fj)
    return jnp.stack([r0, r1], axis=-1)


def _cauchy_weight(sq_norm, c):
    return 1.0 / (1.0 + sq_norm / (c * c))


def _cauchy_cost(sq_norm, c):
    return c * c * jnp.log1p(sq_norm / (c * c))


@partial(jax.jit, static_argnames=("num_cams", "max_iters"))
def _solve_focals(f0, ci, cj, d01, d12, pair_w, free_mask,
                  num_cams: int, loss_c: float, max_iters: int,
                  function_tol: float):
    dtype = f0.dtype

    def cost_of(f):
        r = _pair_residuals(f[ci], f[cj], d01, d12)
        sq = jnp.sum(r * r, -1)
        return jnp.sum(pair_w * _cauchy_cost(sq, loss_c))

    def step(state):
        f, lam, cost, it, done = state

        def per_pair(fi, fj, a, b):
            g = lambda z: _pair_residuals(z[0], z[1], a, b)
            z = jnp.stack([fi, fj])
            return g(z), jax.jacfwd(g)(z)  # (2,), (2, 2)

        r, J = jax.vmap(per_pair)(f[ci], f[cj], d01, d12)
        w = pair_w * _cauchy_weight(jnp.sum(r * r, -1), loss_c)
        # normal equations over focals
        H = jnp.zeros((num_cams, num_cams), dtype)
        JtWJ = jnp.einsum("pri,p,prj->pij", J, w, J)
        g = jnp.einsum("pri,p,pr->pi", J, w, r)
        H = H.at[ci, ci].add(JtWJ[:, 0, 0])
        H = H.at[cj, cj].add(JtWJ[:, 1, 1])
        H = H.at[ci, cj].add(JtWJ[:, 0, 1])
        H = H.at[cj, ci].add(JtWJ[:, 1, 0])
        grad = jnp.zeros((num_cams,), dtype)
        grad = grad.at[ci].add(g[:, 0])
        grad = grad.at[cj].add(g[:, 1])
        # fix non-free cameras: unit row/col, zero grad
        keep = free_mask.astype(dtype)
        H = H * keep[:, None] * keep[None, :] + jnp.diag(1.0 - keep)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(lam * diag + 1e-12)
        grad = grad * keep
        df = -jnp.linalg.solve(H, grad)
        f_new = jnp.maximum(f + df * keep, 1e-3)
        new_cost = cost_of(f_new)
        accept = new_cost < cost
        f = jnp.where(accept, f_new, f)
        lam2 = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                         jnp.minimum(lam * 4.0, 1e8))
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = accept & (rel < function_tol)
        cost = jnp.where(accept, new_cost, cost)
        return (f, lam2, cost, it + 1, done)

    state = (f0, jnp.asarray(1e-3, dtype), cost_of(f0), 0,
             jnp.asarray(False))
    f, _, _, _, _ = jax.lax.while_loop(
        lambda s: (s[3] < max_iters) & ~s[4], step, state)
    return f


def calibrate_view_graph(scene: Scene, vg: ViewGraph,
                         opts: ViewGraphCalibratorOptions | None = None,
                         dtype=None) -> bool:
    """Estimate focals of cameras without priors; invalidate bad pairs."""
    from glomap_tpu.utils.dtypes import solver_dtype
    dtype = dtype or solver_dtype()
    opts = opts or ViewGraphCalibratorOptions()
    use = vg.pair_valid & ((vg.pair_config == CONFIG_CALIBRATED) |
                           (vg.pair_config == CONFIG_UNCALIBRATED))
    idx = np.nonzero(use)[0]
    if len(idx) == 0:
        return True
    ci = scene.image_camera[vg.pair_i[idx]]
    cj = scene.image_camera[vg.pair_j[idx]]

    # G = K1'^T F K0' with principal-point-only K'
    pp = scene.cam_params[:, 2:4]
    K0 = np.tile(np.eye(3), (len(idx), 1, 1))
    K0[:, 0, 2] = pp[ci, 0]
    K0[:, 1, 2] = pp[ci, 1]
    K1 = np.tile(np.eye(3), (len(idx), 1, 1))
    K1[:, 0, 2] = pp[cj, 0]
    K1[:, 1, 2] = pp[cj, 1]
    G = np.einsum("pji,pjk,pkl->pil", K1, vg.pair_F[idx], K0)
    d01, d12 = fetzer_coefficients(jnp.asarray(G, dtype=dtype))

    from glomap_tpu.ops import camera_models as cmod
    f0 = np.asarray(cmod.mean_focal(scene.cam_params))
    free = ~scene.cam_has_prior_focal
    f = _solve_focals(jnp.asarray(f0, dtype=dtype), jnp.asarray(ci),
                      jnp.asarray(cj), d01, d12,
                      jnp.ones(len(idx), dtype=dtype),
                      jnp.asarray(free), scene.num_cameras,
                      float(opts.thres_loss_function),
                      int(opts.max_num_iterations),
                      float(opts.function_tolerance))
    f = np.asarray(f, dtype=np.float64)
    if not np.all(np.isfinite(f)):
        return False

    # reject degenerate estimates; copy back accepted focals
    ratio = f / np.maximum(f0, 1e-12)
    ok = (ratio >= opts.thres_lower_ratio) & (ratio <= opts.thres_higher_ratio)
    upd = free & ok
    scene.cam_params[upd, 0] = f[upd]
    scene.cam_params[upd, 1] = f[upd]
    n_rej = int((free & ~ok).sum())
    if n_rej:
        import logging
        logging.getLogger(__name__).info(
            "%d cameras rejected in view graph calibration", n_rej)

    # filter pairs by converged two-view residual
    f_eval = jnp.asarray(np.where(upd | ~free, f, f0), dtype=dtype)
    r = _pair_residuals(f_eval[jnp.asarray(ci)], f_eval[jnp.asarray(cj)],
                        d01, d12)
    sq = np.asarray(jnp.sum(r * r, -1))
    bad = sq > opts.thres_two_view_error ** 2
    vg.pair_valid[idx[bad]] = False
    return True
