"""Pallas TPU kernels for the hot per-observation sweeps.

BASELINE.json requires the dense hot paths (Jacobian blocks, robust-loss
IRLS sweeps, Schur-complement reduction inputs) as custom kernels. These
kernels use the lane-major layout (k small components as sublanes,
observations as 128-wide lanes) so every operation is a full-width VPU
sweep with all intermediates resident in VMEM:

  * projection_resid_jac / ba_resid_jac_gathered — fused closed-form
    residual + Jacobian blocks (2x25 per observation: rotation tangent,
    translation, point, intrinsics; 2x31 with the optimize_rig
    sensor-pose columns) for EVERY canonical camera kind — perspective,
    equidistant fisheye and FOV, each with the full polynomial
    distortion stage (rational radial + tangential + thin prism) — the
    exact analytic counterpart of the autodiff path in
    estimators/bundle_adjustment (the BA fast path for all models).
  * huber_weight_cost — fused robust-loss sweep r^2 -> (IRLS weight,
    cost) with per-block partial sums.
  * sampson_score — fused squared-Sampson epipolar error over match
    batches (the RANSAC scoring inner loop).

Each wrapper falls back to interpret mode off-TPU so the kernels are unit
tested on CPU against the XLA reference implementations.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
OBS_BLOCK = 1024  # observations per grid step


def _on_tpu():
    return jax.default_backend() == "tpu"


def _cdiv(a, b):
    return -(-a // b)


# ----------------------------------------------------------------------------
# fused projection residual + Jacobian blocks (ALL camera kinds)
# ----------------------------------------------------------------------------
# Covers every canonical camera (ops/camera_models.img_from_cam):
#   kind 0 perspective: (u, v) = (x, y)
#   kind 1 fisheye:     (u, v) = (x, y) * atan(r)/r   (equidistant base)
#   kind 2 FOV:         (u, v) = (x, y) * atan(2 r tan(w/2)) / (w r)
# followed by the shared polynomial distortion stage — rational radial
# (1 + k1 s2 + k2 s4 + k3 s6 + k4 s8)/(1 + d1 s2 + d2 s4 + d3 s6) with
# s2 = u^2 + v^2, tangential p1/p2, thin-prism sx1/sy1 — i.e. all 11
# COLMAP models (SIMPLE_PINHOLE..THIN_PRISM_FISHEYE + 1D_RADIAL's
# canonicalization), with exact closed-form Jacobians (matches the
# autodiff path to ~1e-6). The kind branch is three cheap VPU formulas
# + selects, so mixed perspective/fisheye scenes fuse into ONE sweep.
#
# inputs (transposed, component-rows x observation-lanes):
#   Mrow (9, O): M = R_s R_f           (world -> camera rotation)
#   Srow (9, O): R_s                   (sensor rotation, for d/d t_f)
#   brow (3, O): b = R_s t_f + t_s     (translation part)
#   Xrow (3, O): point
#   uvrow (2, O): observed pixel
#   krow (16, O): canonical slots 0..15
#                 [fx fy cx cy k1..k4 d1..d3 p1 p2 sx1 sy1 omega]
#   baserow (3, O): kind base-map chain scalars [a, kq, da_dw] from
#                 projection_base_rows — computed OUTSIDE the kernel in
#                 XLA because Mosaic has no atan/tan lowering; they fuse
#                 into the surrounding gather chain for free.
# outputs:
#   r (2, O), J (50, O) = flattened (2, 25) per obs with column order
#   [w(3), dt(3), dX(3), intr(16)] matching estimators/bundle_adjustment.


def projection_base_rows(x, y, omega, kind):
    """Kind base-map chain scalars, XLA-side (exact atan/tan):
      a(r):    (u, v) = a * (x, y)
      kq:      a'(r)/r, so G2 = d(u,v)/d(x,y) = a I + kq (x,y)(x,y)^T
      da_dw:   d a / d omega (FOV only; zero otherwise)
    x, y, omega, kind: broadcast-compatible arrays -> (3, ...) stack."""
    is_fe = kind == 1.0
    is_fov = kind == 2.0
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rr2 = x * x + y * y
    rr = jnp.sqrt(jnp.maximum(rr2, 1e-18))
    small_r = rr < 1e-6
    rr2s = jnp.maximum(rr2, 1e-18)
    # fisheye: a = atan(r)/r; a'(r) = (1/(1+r^2) - a)/r
    th = jnp.arctan(rr)
    a_fe = jnp.where(small_r, 1.0 - rr2 / 3.0, th / rr)
    kq_fe = jnp.where(small_r, -2.0 / 3.0,
                      (1.0 / (1.0 + rr2) - a_fe) / rr2s)
    # FOV: a = atan(2 r t)/(w r), t = tan(w/2); small-omega -> identity
    w_ok = jnp.abs(omega) > 1e-6
    w_safe = jnp.where(w_ok, omega, 1e-6)
    tanh_ = jnp.tan(0.5 * w_safe)
    q = 2.0 * rr * tanh_
    atq = jnp.arctan(q)
    iden_q = 1.0 / (1.0 + q * q)
    a_fov_raw = jnp.where(small_r, 2.0 * tanh_ / w_safe,
                          atq / (w_safe * rr))
    kq_fov_raw = jnp.where(
        small_r, -(16.0 * tanh_ ** 3) / (3.0 * w_safe),
        (2.0 * tanh_ * iden_q / w_safe - a_fov_raw) / rr2s)
    a_fov = jnp.where(w_ok, a_fov_raw, one)
    kq_fov = jnp.where(w_ok, kq_fov_raw, zero)
    sec2h = 1.0 + tanh_ * tanh_  # sec^2(w/2) = 1 + tan^2(w/2)
    da_dw_raw = jnp.where(
        small_r,
        sec2h / w_safe - 2.0 * tanh_ / (w_safe * w_safe),
        (rr * sec2h * iden_q - atq / w_safe) / (w_safe * rr))
    da_dw = jnp.where(is_fov & w_ok, da_dw_raw, zero)

    a_sel = jnp.where(is_fe, a_fe, jnp.where(is_fov, a_fov, one))
    kq_sel = jnp.where(is_fe, kq_fe, jnp.where(is_fov, kq_fov, zero))
    return jnp.stack([a_sel, kq_sel, da_dw])


def xy_from_rows(M, bt, X):
    """Perspective divide from lane-major rows: (x, y) each (O,)."""
    p0 = M[0] * X[0] + M[1] * X[1] + M[2] * X[2] + bt[0]
    p1c = M[3] * X[0] + M[4] * X[1] + M[5] * X[2] + bt[1]
    p2c = M[6] * X[0] + M[7] * X[1] + M[8] * X[2] + bt[2]
    z = jnp.where(jnp.abs(p2c) < 1e-9, 1e-9, p2c)
    return p0 / z, p1c / z


def _projection_kernel(M_ref, S_ref, b_ref, X_ref, uv_ref, k_ref,
                       base_ref, r_ref, J_ref, *, zdim: int = 25,
                       ts_ref=None):
    """zdim 25: [w(3) dt(3) dX(3) intr(16)]; zdim 31 additionally fills
    the sensor-pose columns [ws(3) dts(3)] (optimize_rig): with
    y = R_f X + t_f,  dp/dws = -R_s [y]x = (S e_k) x (p - t_s)  and
    dp/dt_s = I — ts_ref supplies the (3, O) sensor-translation rows."""
    M = M_ref[...]
    S = S_ref[...]
    bt = b_ref[...]
    X = X_ref[...]
    uv = uv_ref[...]
    intr = k_ref[...]
    base = base_ref[...]

    X0, X1, X2 = X[0], X[1], X[2]
    # p = M X + b
    p0 = M[0] * X0 + M[1] * X1 + M[2] * X2 + bt[0]
    p1c = M[3] * X0 + M[4] * X1 + M[5] * X2 + bt[1]
    p2c = M[6] * X0 + M[7] * X1 + M[8] * X2 + bt[2]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    k1, k2, k3, k4 = intr[4], intr[5], intr[6], intr[7]
    d1, d2, d3 = intr[8], intr[9], intr[10]
    tp1, tp2 = intr[11], intr[12]
    sx1, sy1 = intr[13], intr[14]

    z = jnp.where(jnp.abs(p2c) < 1e-9, 1e-9, p2c)
    iz = 1.0 / z
    x = p0 * iz
    y = p1c * iz

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    a_sel, kq_sel, da_dw = base[0], base[1], base[2]

    u = x * a_sel
    v = y * a_sel
    # G2 entries
    G2xx = a_sel + kq_sel * x * x
    G2xy = kq_sel * x * y
    G2yy = a_sel + kq_sel * y * y

    # --- polynomial distortion on (u, v) (ops/camera_models.distort)
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6 + k4 * r4 * r4
    den = 1.0 + d1 * r2 + d2 * r4 + d3 * r6
    iden = 1.0 / den
    radial = num * iden
    xy2 = 2.0 * u * v
    du = u * radial + tp1 * xy2 + tp2 * (r2 + 2.0 * u * u) + sx1 * r2
    dv = v * radial + tp2 * xy2 + tp1 * (r2 + 2.0 * v * v) + sy1 * r2

    r_ref[0, :] = fx * du + cx - uv[0]
    r_ref[1, :] = fy * dv + cy - uv[1]

    # d radial / d r2 = (num' den - num den') / den^2
    dnum = k1 + 2.0 * k2 * r2 + 3.0 * k3 * r4 + 4.0 * k4 * r6
    dden = d1 + 2.0 * d2 * r2 + 3.0 * d3 * r4
    drad = (dnum - radial * dden) * iden

    # D = d (du, dv) / d (u, v)  (2x2 closed form)
    Dxx = radial + 2.0 * u * u * drad + 2.0 * tp1 * v + 6.0 * tp2 * u \
        + 2.0 * sx1 * u
    Dxy = 2.0 * u * v * drad + 2.0 * tp1 * u + 2.0 * tp2 * v + 2.0 * sx1 * v
    Dyx = 2.0 * u * v * drad + 2.0 * tp2 * v + 2.0 * tp1 * u + 2.0 * sy1 * u
    Dyy = radial + 2.0 * v * v * drad + 2.0 * tp2 * u + 6.0 * tp1 * v \
        + 2.0 * sy1 * v

    # G = diag(fx, fy) D G2  then chain with P = d(x, y)/dp =
    # [[iz, 0, -x iz], [0, iz, -y iz]]
    g00 = fx * (Dxx * G2xx + Dxy * G2xy)
    g01 = fx * (Dxx * G2xy + Dxy * G2yy)
    g10 = fy * (Dyx * G2xx + Dyy * G2xy)
    g11 = fy * (Dyx * G2xy + Dyy * G2yy)

    def writeJ(col, e0, e1, e2):
        """column `col` of the (2,zdim) Jacobian from dp/dth = (e0,e1,e2)."""
        dx = iz * (e0 - x * e2)
        dy = iz * (e1 - y * e2)
        J_ref[col, :] = g00 * dx + g01 * dy
        J_ref[zdim + col, :] = g10 * dx + g11 * dy

    # d p / d t_f = R_s  (columns of S)
    writeJ(3, S[0], S[3], S[6])
    writeJ(4, S[1], S[4], S[7])
    writeJ(5, S[2], S[5], S[8])

    # d p / d X = M (columns)
    writeJ(6, M[0], M[3], M[6])
    writeJ(7, M[1], M[4], M[7])
    writeJ(8, M[2], M[5], M[8])

    # d p / d w: Exp(w) X ~ X - [X]_x w  =>  dp/dw = -M [X]_x, columns:
    #   col0 = M @ (0, -X2, X1); col1 = M @ (X2, 0, -X0);
    #   col2 = M @ (-X1, X0, 0)
    def mcol(v0, v1, v2):
        return (M[0] * v0 + M[1] * v1 + M[2] * v2,
                M[3] * v0 + M[4] * v1 + M[5] * v2,
                M[6] * v0 + M[7] * v1 + M[8] * v2)

    writeJ(0, *mcol(zero, -X2, X1))
    writeJ(1, *mcol(X2, zero, -X0))
    writeJ(2, *mcol(-X1, X0, zero))

    # intrinsics (canonical slots s -> column 9+s):
    #   fx (0): (du, 0); fy (1): (0, dv); cx (2): (1, 0); cy (3): (0, 1);
    #   k_s (4..7):  d radial / d k_s = r2^{s+1} / den    (on u,v radius)
    #   d_s (8..10): d radial / d d_s = -radial r2^{s+1} / den
    #   p1 (11): (fx 2 u v, fy (r2 + 2 v^2))
    #   p2 (12): (fx (r2 + 2 u^2), fy 2 u v)
    #   sx1 (13): (fx r2, 0); sy1 (14): (0, fy r2)
    #   omega (15): FOV base-map sensitivity through the distortion chain
    J_ref[9, :] = du
    J_ref[zdim + 9, :] = zero
    J_ref[10, :] = zero
    J_ref[zdim + 10, :] = dv
    J_ref[11, :] = one
    J_ref[zdim + 11, :] = zero
    J_ref[12, :] = zero
    J_ref[zdim + 12, :] = one
    fxu = fx * u * iden
    fyv = fy * v * iden
    rp = one
    for s in range(4):  # k1..k4
        rp = rp * r2
        J_ref[13 + s, :] = fxu * rp
        J_ref[zdim + 13 + s, :] = fyv * rp
    rp = one
    for s in range(3):  # d1..d3
        rp = rp * r2
        J_ref[17 + s, :] = -fxu * radial * rp
        J_ref[zdim + 17 + s, :] = -fyv * radial * rp
    J_ref[20, :] = fx * xy2
    J_ref[zdim + 20, :] = fy * (r2 + 2.0 * v * v)
    J_ref[21, :] = fx * (r2 + 2.0 * u * u)
    J_ref[zdim + 21, :] = fy * xy2
    J_ref[22, :] = fx * r2
    J_ref[zdim + 22, :] = zero
    J_ref[23, :] = zero
    J_ref[zdim + 23, :] = fy * r2
    # d(du,dv)/domega = D * (x, y) * da/dw  (zero unless FOV)
    du_dw = x * da_dw
    dv_dw = y * da_dw
    J_ref[24, :] = fx * (Dxx * du_dw + Dxy * dv_dw)
    J_ref[zdim + 24, :] = fy * (Dyx * du_dw + Dyy * dv_dw)

    if zdim > 25:
        # sensor-pose columns (optimize_rig): dp/dws_k = (S e_k) x a
        # with a = p - t_s;  dp/dt_s = e_k
        ts = ts_ref[...]
        a0 = p0 - ts[0]
        a1 = p1c - ts[1]
        a2 = p2c - ts[2]
        for k in range(3):
            s0, s1, s2 = S[k], S[3 + k], S[6 + k]  # column k of S
            writeJ(25 + k,
                   s1 * a2 - s2 * a1,
                   s2 * a0 - s0 * a2,
                   s0 * a1 - s1 * a0)
        writeJ(28, one, zero, zero)
        writeJ(29, zero, one, zero)
        writeJ(30, zero, zero, one)


@partial(jax.jit, static_argnames=("interpret",))
def projection_resid_jac(Mrow, Srow, brow, Xrow, uvrow, krow, kindrow,
                         tsrow=None, interpret: bool = False):
    """Transposed inputs (k, O) -> (r (2, O), J (2*zdim, O)); all kinds.
    zdim = 25, or 31 with sensor-pose columns when tsrow (3, O) is given.

    The transcendental base-map scalars (atan/tan have no Mosaic
    lowering) are computed here in XLA and streamed into the kernel as
    three extra rows."""
    O = Mrow.shape[1]
    dtype = Mrow.dtype
    blk = min(OBS_BLOCK, max(LANES, O))
    grid = (_cdiv(O, blk),)

    x, y = xy_from_rows(Mrow, brow, Xrow)
    baserow = projection_base_rows(x, y, krow[15], kindrow[0])
    zdim = 25 if tsrow is None else 31

    def spec(k):
        return pl.BlockSpec((k, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(9), spec(9), spec(3), spec(3), spec(2), spec(16),
                spec(3)]
    operands = [Mrow, Srow, brow, Xrow, uvrow, krow, baserow]
    if tsrow is not None:
        in_specs.append(spec(3))
        operands.append(tsrow)

        def kern(M, S, b, X, uv, k, base, ts, r, J):
            _projection_kernel(M, S, b, X, uv, k, base, r, J,
                               zdim=31, ts_ref=ts)
    else:
        kern = _projection_kernel

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec(2), spec(2 * zdim)],
        out_shape=[jax.ShapeDtypeStruct((2, O), dtype),
                   jax.ShapeDtypeStruct((2 * zdim, O), dtype)],
        interpret=interpret,
    )(*operands)


def perspective_resid_jac(Mrow, Srow, brow, Xrow, uvrow, krow,
                          interpret: bool = False):
    """Back-compat wrapper: kind-0 cameras, 15-slot intrinsics rows."""
    krow16 = jnp.concatenate([krow, jnp.zeros_like(krow[:1])])
    kindrow = jnp.zeros_like(krow[:1])
    return projection_resid_jac(Mrow, Srow, brow, Xrow, uvrow, krow16,
                                kindrow, interpret=interpret)


def ba_resid_jac_gathered(fq, ft, sq, st, cpar, kind, X, uv,
                          interpret: bool | None = None):
    """Gathered per-obs arrays (O, k) -> (r (O, 2), J (O, 2, 25)).

    Drop-in replacement for the vmapped-jacfwd `_resid_and_jac_v` for any
    canonical camera kind. The quat->rotmat precompute and the final
    transposes stay in XLA (cheap, fusable); the heavy fused sweep is the
    Pallas kernel.
    """
    from glomap_tpu.math import rotation as rotm
    if interpret is None:
        interpret = not _on_tpu()
    Rf = rotm.quat_to_rotmat(fq)
    Rs = rotm.quat_to_rotmat(sq)
    M = Rs @ Rf
    b = jnp.einsum("oij,oj->oi", Rs, ft) + st

    O = fq.shape[0]
    pad = (-O) % LANES
    def T(a, k):
        a2 = a.reshape(O, k).T
        if pad:
            a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        return a2

    r_t, J_t = projection_resid_jac(
        T(M, 9), T(Rs, 9), T(b, 3), T(X, 3), T(uv, 2),
        T(cpar[:, 0:16], 16), T(kind.astype(cpar.dtype), 1),
        interpret=interpret)
    r = r_t[:, :O].T
    # J_t layout: row index = col + 25*row_of_r; de-interleave to (O, 2, 25)
    Jf = J_t[:, :O].T  # (O, 50)
    J = jnp.stack([Jf[:, 0:25], Jf[:, 25:50]], axis=1)  # (O, 2, 25)
    return r, J


def ba_resid_jac_pinhole(fq, ft, sq, st, cpar, X, uv,
                         interpret: bool | None = None):
    """Back-compat wrapper of ba_resid_jac_gathered for kind-0 batches."""
    kind = jnp.zeros((fq.shape[0],), dtype=cpar.dtype)
    return ba_resid_jac_gathered(fq, ft, sq, st, cpar, kind, X, uv,
                                 interpret=interpret)


# ----------------------------------------------------------------------------
# sorted-segment row reduction (the Schur point-axis primitive)
# ----------------------------------------------------------------------------
# (k, O) row stacks -> (num_segments, k) sums over a SORTED id axis. TPU
# scatter-adds cost ~1 ms per 100k-element row (measured, v5e) and the BA
# point axis needs 18+ of them per LM iteration plus 3 per CG matvec; a
# full one-hot matmul stops scaling once num_segments x O exceeds ~1e9
# (city-scale: 10M obs x 1M points). This kernel exploits sortedness:
# within a B-observation block the ids span at most `width` distinct
# segments, so the block reduction is a LOCAL one-hot matmul
# (width, B) x (B, k) on the MXU with the one-hot built in-register from
# a broadcasted iota — O(O * width) work, independent of num_segments.
# Block partials land in (num_blocks, width, k) and a final tiny
# segment-sum (num_blocks * width rows) combines straddling segments.


def _sorted_seg_kernel(ids_ref, vals_ref, part_ref, *, exact=False):
    ids = ids_ref[0, :]  # (B,) int32; block spans < W distinct ids
    start = jnp.min(ids)
    W = part_ref.shape[1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (W, ids.shape[0]), 0)
          + start) == ids[None, :]
    part_ref[0, :, :] = jax.lax.dot_general(
        oh.astype(vals_ref.dtype), vals_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=vals_ref.dtype,
        precision=(jax.lax.Precision.HIGHEST if exact else None))


@partial(jax.jit, static_argnames=("num_segments", "width", "block",
                                   "interpret", "exact"))
def sorted_segment_rowsum(vals, ids, num_segments: int, width: int,
                          block: int = 2048, interpret: bool = False,
                          exact: bool = False):
    """vals (k, O), ids (O,) int32 sorted ascending -> (num_segments, k).

    `width` must be >= max over B-blocks of (ids[last] - ids[first] + 1)
    (callers compute it on host and bucket it; see
    estimators/bundle_adjustment). No prefix-sum cancellation. exact=True
    runs the one-hot contraction under bf16x3 (Precision.HIGHEST) so the
    f32 VALS operand is not rounded to bf16 — use for once-per-call
    assemblies whose sums feed geometry directly (the 0/1 one-hot side is
    exact either way, but the default single pass rounds vals to ~3
    digits)."""
    k, O = vals.shape
    dtype = vals.dtype
    pad = (-O) % block
    if pad:
        # keep the tail sorted: pad with the final id, zero values
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[O - 1], (pad,))])
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    nb = (O + pad) // block

    if _ACCUM_POSTLUDE:
        w2 = ((width + 127) // 128) * 128 + 128
        return _accum_call(
            partial(_sorted_seg_accum_kernel, w2=w2, exact=exact),
            partial(_sorted_seg_vmem_kernel, w2=w2, exact=exact),
            [vals],
            [pl.BlockSpec((k, block), lambda i: (0, i),
                          memory_space=pltpu.VMEM)],
            ids, num_segments, width, block, k, dtype, interpret)

    parts = pl.pallas_call(
        partial(_sorted_seg_kernel, exact=exact),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, width, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, width, k), dtype),
        interpret=interpret,
    )(ids.reshape(1, -1), vals)

    starts = jnp.min(ids.reshape(nb, block), axis=1, keepdims=True)
    seg = (starts + jnp.arange(width, dtype=jnp.int32)[None, :]).reshape(-1)
    out = jax.ops.segment_sum(parts.reshape(nb * width, k), seg,
                              num_segments=num_segments + width)
    return out[:num_segments]


def _sorted_gather_kernel(ids_ref, tab_ref, out_ref, *, win,
                          exact=True):
    ids = ids_ref[0, :]  # (B,) int32; block spans < win - 128 distinct ids
    # lane-dim DMA offsets must be 128-aligned: round the window start
    # down (the window is sized with 128 slack for this)
    start = pl.multiple_of((jnp.min(ids) // 128) * 128, 128)

    def body(scratch, sem):
        dma = pltpu.make_async_copy(tab_ref.at[:, pl.ds(start, win)],
                                    scratch, sem)
        dma.start()
        dma.wait()
        oh = (jax.lax.broadcasted_iota(jnp.int32, (win, ids.shape[0]), 0)
              + start) == ids[None, :]
        # (k, B) = (k, W) (W, B)
        out_ref[...] = jax.lax.dot_general(
            scratch[...], oh.astype(scratch.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=scratch.dtype,
            precision=(jax.lax.Precision.HIGHEST if exact else None))

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((tab_ref.shape[0], win),
                                     tab_ref.dtype),
                  sem=pltpu.SemaphoreType.DMA(()))


@partial(jax.jit, static_argnames=("width", "block", "interpret",
                                   "exact"))
def sorted_segment_gather(tab, ids, width: int, block: int = 2048,
                          interpret: bool = False, exact: bool = True):
    """tab (num_segments, k), ids (O,) int32 sorted -> (k, O) lane-major
    gather tab[ids].T — the dual of sorted_segment_rowsum. Lane-axis
    gathers run at ~5 GB/s on TPU (measured); this kernel DMAs the
    lane window a sorted block can touch (the table rides the lane axis,
    transposed) into VMEM and expands it with a local one-hot matmul on
    the MXU.

    exact=True runs the one-hot dot at HIGHEST precision: one-hot x f32
    under bf16x3 reconstructs the f32 value EXACTLY (default bf16 rounds
    every gathered value to ~3 digits — enough to shift threshold
    classifications and to set a spurious BA cost floor, both measured).
    Pass exact=False inside iterative solvers whose outer loop absorbs
    operator noise (the BA CG matvec) to save the 3x MXU passes."""
    T, k = tab.shape
    O = ids.shape[0]
    dtype = tab.dtype
    pad = (-O) % block
    if pad:
        ids_p = jnp.concatenate([ids,
                                 jnp.broadcast_to(ids[O - 1], (pad,))])
    else:
        ids_p = ids
    nb = (O + pad) // block
    # window size: width plus 128 slack for aligned starts, lane-rounded;
    # sublane (k) padded to the f32 tile multiple for the DMA slice
    win = -(-(width + 128) // 128) * 128
    k_pad = -(-k // 8) * 8
    tab_T = jnp.pad(tab.T, ((0, k_pad - k), (0, win)))  # (k_pad, T + win)

    out = pl.pallas_call(
        partial(_sorted_gather_kernel, win=win, exact=exact),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full table; manual DMA
        ],
        out_specs=pl.BlockSpec((k_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, O + pad), dtype),
        interpret=interpret,
    )(ids_p.reshape(1, -1), tab_T)
    return out[:k, :O]


def block_width_for_sorted(ids: np.ndarray, block: int = 2048) -> int:
    """Host helper: max id span (max - min + 1) of any `block`-sized chunk,
    bucketed to a power of two (static kernel arg). The kernels only need
    each block's ids to fit a bounded window, not global sortedness — a
    frame axis with capture locality (tracks renumbered by mean frame)
    qualifies just like the sorted point axis."""
    n = len(ids)
    if n == 0:
        return 8
    pad = (-n) % block
    if pad:
        ids = np.concatenate([ids, np.full(pad, ids[-1], ids.dtype)])
    chunks = ids.reshape(-1, block)
    w = int((chunks.max(axis=1) - chunks.min(axis=1)).max()) + 1
    b = 8
    while b < w:
        b *= 2
    return b


# Accumulating postlude: instead of emitting (num_blocks, width, k)
# partials + an XLA scatter-add (profiled at 34% of the 10M-obs BA step
# at ~1 GB/s — the slowest op class on TPU), each grid step
# read-modify-writes its segment window of the FULL output directly.
# TPU Pallas grids execute sequentially on one core and every DMA below
# is waited before the next issues, so cross-block accumulation into
# overlapping windows is race-free. The output rides an aliased
# pre-zeroed input in ANY memory space; window row offsets round down
# to the 8-row sublane tile (w2 = width + 8 slack).
# GLOMAP_ACCUM_POSTLUDE=0 restores the scatter postlude (A/B hatch)
_ACCUM_POSTLUDE = os.environ.get("GLOMAP_ACCUM_POSTLUDE", "1") != "0"
# accumulator tables at most this big stay RESIDENT IN VMEM across grid
# steps (out block constant -> Mosaic keeps it on-chip, zero DMA); bigger
# tables use the windowed HBM read-modify-write. The RMW chain serializes
# grid steps on DMA round-trips: a +51% win at 10M obs / 1M segments
# (where it deletes a 34%-of-step scatter) but a 3.6x LOSS on GP's small
# 100k-segment tables — measured round 5.
_VMEM_TABLE_BYTES = 8 << 20


def _seg_accum_body(ids_ref, out_ref, prod, *, w2, exact):
    # out_ref is (k, S_pad): the segment axis rides the LANES so the
    # dynamic window offset can satisfy Mosaic's 128-aligned-slice rule
    # (rounded down with 128 slack, like the gather kernel)
    ids = ids_ref[0, :]
    start = pl.multiple_of((jnp.min(ids) // 128) * 128, 128)
    k8 = out_ref.shape[0]  # k padded to the 8-row sublane tile
    if prod.shape[0] < k8:  # zero rows keep the DMA slice tile-aligned
        prod = jnp.concatenate(
            [prod, jnp.zeros((k8 - prod.shape[0], prod.shape[1]),
                             prod.dtype)])

    def body(scratch, sem):
        dma_r = pltpu.make_async_copy(out_ref.at[:, pl.ds(start, w2)],
                                      scratch, sem)
        dma_r.start()
        dma_r.wait()
        oh = (jax.lax.broadcasted_iota(jnp.int32, (w2, ids.shape[0]), 0)
              + start) == ids[None, :]
        scratch[...] += jax.lax.dot_general(
            prod, oh.astype(prod.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=prod.dtype,
            precision=(jax.lax.Precision.HIGHEST if exact else None))
        dma_w = pltpu.make_async_copy(scratch,
                                      out_ref.at[:, pl.ds(start, w2)],
                                      sem)
        dma_w.start()
        dma_w.wait()

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((k8, w2), prod.dtype),
                  sem=pltpu.SemaphoreType.DMA(()))


def _sorted_seg_accum_kernel(ids_ref, vals_ref, _zeros_ref, out_ref, *,
                             w2, exact):
    _seg_accum_body(ids_ref, out_ref, vals_ref[...], w2=w2, exact=exact)


def _seg_vmem_body(ids_ref, out_ref, prod, *, w2, exact):
    # out_ref is the FULL (k8, S_pad) table in VMEM (constant out block:
    # Mosaic keeps it resident and writes HBM once at grid end)
    ids = ids_ref[0, :]
    start = pl.multiple_of((jnp.min(ids) // 128) * 128, 128)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    oh = (jax.lax.broadcasted_iota(jnp.int32, (w2, ids.shape[0]), 0)
          + start) == ids[None, :]
    local = jax.lax.dot_general(
        prod, oh.astype(prod.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=prod.dtype,
        precision=(jax.lax.Precision.HIGHEST if exact else None))
    k8 = out_ref.shape[0]
    if local.shape[0] < k8:
        local = jnp.concatenate(
            [local, jnp.zeros((k8 - local.shape[0], w2), local.dtype)])
    out_ref[:, pl.ds(start, w2)] += local


def _sorted_seg_vmem_kernel(ids_ref, vals_ref, out_ref, *, w2, exact):
    _seg_vmem_body(ids_ref, out_ref, vals_ref[...], w2=w2, exact=exact)


def _pair_rowsum_vmem_kernel(ids_ref, U_ref, V_ref, out_ref, *, pairs,
                             w2):
    U = U_ref[...]
    V = V_ref[...]
    prod = jnp.stack([sum(U[a] * V[b] for a, b in terms)
                      for terms in pairs])
    _seg_vmem_body(ids_ref, out_ref, prod, w2=w2, exact=False)


def _pair_rowsum_accum_kernel(ids_ref, U_ref, V_ref, _zeros_ref, out_ref,
                              *, pairs, w2):
    U = U_ref[...]
    V = V_ref[...]
    prod = jnp.stack([sum(U[a] * V[b] for a, b in terms)
                      for terms in pairs])  # (R, B) in VMEM only
    _seg_accum_body(ids_ref, out_ref, prod, w2=w2, exact=False)


def _accum_call(kernel_rmw, kernel_vmem, extra_inputs, extra_specs, ids,
                num_segments, width, block, k, dtype, interpret):
    O = ids.shape[0]  # already block-padded by the caller
    nb = O // block
    # DMA/slice window: 128-multiple length covering width + up-to-127
    # of round-down slack (Mosaic requires lane slices sized AND offset
    # in whole 128 tiles)
    w2 = ((width + 127) // 128) * 128 + 128
    S_pad = num_segments + w2
    k8 = -(-k // 8) * 8
    if k8 * S_pad * dtype.itemsize <= _VMEM_TABLE_BYTES:
        out = pl.pallas_call(
            kernel_vmem,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + extra_specs,
            out_specs=pl.BlockSpec((k8, S_pad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k8, S_pad), dtype),
            interpret=interpret,
        )(ids.reshape(1, -1), *extra_inputs)
        return out[:k, :num_segments].T
    zeros = jnp.zeros((k8, S_pad), dtype)
    out = pl.pallas_call(
        kernel_rmw,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + extra_specs
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((k8, S_pad), dtype),
        input_output_aliases={1 + len(extra_inputs): 0},
        interpret=interpret,
    )(ids.reshape(1, -1), *extra_inputs, zeros)
    return out[:k, :num_segments].T


# ----------------------------------------------------------------------------
# fused pair-product windowed reductions (the BA CG inner loop)
# ----------------------------------------------------------------------------
#
# The Schur-reduced camera-system matvec (estimators/bundle_adjustment,
# SURVEY.md §3.5) is built from three memory-bound primitives over the
# lane-major observation axis:
#   reduce(J^T y):   rows[i] = J[0,i]*y[0] + J[1,i]*y[1], then windowed sum
#   H-block builds:  rows[i*m+j] = sum_r A[r,i]*B[r,j], then windowed sum
#   J (gather v):    out[r] = sum_j J[r,j] * v[ids][j]
# Composing them from sorted_segment_rowsum/gather materializes every
# intermediate row stack in HBM ((k, O) each, re-read immediately by the
# next op) — profiled at ~30% of the BA step (BENCH_NOTES speed-of-light
# note: concatenates + windowed ops dominate; the step is HBM/latency
# bound). These fused variants form the product rows inside VMEM and only
# ever touch HBM with the kernel's true inputs and outputs.


def _pair_rowsum_kernel(ids_ref, U_ref, V_ref, part_ref, *, pairs):
    ids = ids_ref[0, :]  # (B,) int32; block spans < W distinct ids
    start = jnp.min(ids)
    W = part_ref.shape[1]
    U = U_ref[...]
    V = V_ref[...]
    prod = jnp.stack([sum(U[a] * V[b] for a, b in terms)
                      for terms in pairs])  # (R, B) in VMEM only
    oh = (jax.lax.broadcasted_iota(jnp.int32, (W, ids.shape[0]), 0)
          + start) == ids[None, :]
    part_ref[0, :, :] = jax.lax.dot_general(
        oh.astype(prod.dtype), prod,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=prod.dtype)


@partial(jax.jit, static_argnames=("pairs", "num_segments", "width",
                                   "block", "interpret"))
def sorted_segment_pair_rowsum(U, V, pairs, ids, num_segments: int,
                               width: int, block: int = 2048,
                               interpret: bool = False):
    """out[s, r] = sum_{o in segment s} sum_{(a, b) in pairs[r]}
    U[a, o] * V[b, o]  — sorted_segment_rowsum with the product rows
    formed in VMEM instead of stacked through HBM.

    U (ku, O), V (kv, O) lane-major; ids (O,) int32 sorted (same window
    contract as sorted_segment_rowsum); pairs a static tuple of tuples of
    (a, b) index pairs. Covers J^T y reductions (pairs of one J row and
    one y row) and Gram/Schur block builds (pairs over the residual-row
    axis) without materializing the (R, O) stack."""
    ku, O = U.shape
    dtype = U.dtype
    R = len(pairs)
    pad = (-O) % block
    if pad:
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[O - 1], (pad,))])
        U = jnp.pad(U, ((0, 0), (0, pad)))
        V = jnp.pad(V, ((0, 0), (0, pad)))
    nb = (O + pad) // block

    if _ACCUM_POSTLUDE:
        nV = V.shape[0]
        w2 = ((width + 127) // 128) * 128 + 128
        return _accum_call(
            partial(_pair_rowsum_accum_kernel, pairs=pairs, w2=w2),
            partial(_pair_rowsum_vmem_kernel, pairs=pairs, w2=w2),
            [U, V],
            [pl.BlockSpec((ku, block), lambda i: (0, i),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((nV, block), lambda i: (0, i),
                          memory_space=pltpu.VMEM)],
            ids, num_segments, width, block, R, dtype, interpret)

    parts = pl.pallas_call(
        partial(_pair_rowsum_kernel, pairs=pairs),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ku, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V.shape[0], block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, width, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, width, R), dtype),
        interpret=interpret,
    )(ids.reshape(1, -1), U, V)

    starts = jnp.min(ids.reshape(nb, block), axis=1, keepdims=True)
    seg = (starts + jnp.arange(width, dtype=jnp.int32)[None, :]).reshape(-1)
    out = jax.ops.segment_sum(parts.reshape(nb * width, R), seg,
                              num_segments=num_segments + width)
    return out[:num_segments]


def _gather_dot_kernel(ids_ref, U_ref, tab_ref, out_ref, *, win, k, nr):
    ids = ids_ref[0, :]
    start = pl.multiple_of((jnp.min(ids) // 128) * 128, 128)

    def body(scratch, sem):
        dma = pltpu.make_async_copy(tab_ref.at[:, pl.ds(start, win)],
                                    scratch, sem)
        dma.start()
        dma.wait()
        oh = (jax.lax.broadcasted_iota(jnp.int32, (win, ids.shape[0]), 0)
              + start) == ids[None, :]
        rows = jax.lax.dot_general(
            scratch[...], oh.astype(scratch.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=scratch.dtype,
            precision=jax.lax.Precision.HIGHEST)  # (k_pad, B) in VMEM
        U = U_ref[...]
        out_ref[...] = jnp.stack(
            [sum(U[r * k + j] * rows[j] for j in range(k))
             for r in range(nr)] + [rows[0] * 0.0] * (out_ref.shape[0] - nr))

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((tab_ref.shape[0], win),
                                     tab_ref.dtype),
                  sem=pltpu.SemaphoreType.DMA(()))


@partial(jax.jit, static_argnames=("width", "block", "interpret"))
def sorted_segment_gather_dot(tab, ids, U, width: int, block: int = 2048,
                              interpret: bool = False):
    """out[r, o] = sum_j U[r*k + j, o] * tab[ids[o], j]  for r < nr,
    where tab is (num_segments, k) and U is (nr*k, O) lane-major — the
    fused J * gather(v) product (J_apply in the BA matvec) without the
    (k, O) gathered row stack passing through HBM."""
    T, k = tab.shape
    nrk, O = U.shape
    nr = nrk // k
    dtype = tab.dtype
    pad = (-O) % block
    if pad:
        ids_p = jnp.concatenate([ids,
                                 jnp.broadcast_to(ids[O - 1], (pad,))])
        U_p = jnp.pad(U, ((0, 0), (0, pad)))
    else:
        ids_p, U_p = ids, U
    nb = (O + pad) // block
    win = -(-(width + 128) // 128) * 128
    k_pad = -(-k // 8) * 8
    nr_pad = -(-nr // 8) * 8
    tab_T = jnp.pad(tab.T, ((0, k_pad - k), (0, win)))

    out = pl.pallas_call(
        partial(_gather_dot_kernel, win=win, k=k, nr=nr),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrk, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full table; manual DMA
        ],
        out_specs=pl.BlockSpec((nr_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr_pad, O + pad), dtype),
        interpret=interpret,
    )(ids_p.reshape(1, -1), U_p, tab_T)
    return out[:nr, :O]


# ----------------------------------------------------------------------------
# fused Huber IRLS sweep
# ----------------------------------------------------------------------------


def _huber_kernel(r2_ref, w_ref, c_ref, *, delta):
    r2 = r2_ref[...]
    d2 = delta * delta
    rn = jnp.sqrt(jnp.maximum(r2, 1e-30))
    w_ref[...] = jnp.where(r2 <= d2, 1.0, delta / rn)
    c_ref[...] = jnp.where(r2 <= d2, r2, 2.0 * delta * rn - d2)


@partial(jax.jit, static_argnames=("delta", "interpret"))
def huber_weight_cost(r2, delta: float, interpret: bool = False):
    """(O,) squared norms -> (weights (O,), costs (O,)); one fused sweep."""
    O = r2.shape[0]
    pad = (-O) % LANES
    r2p = jnp.pad(r2, (0, pad)).reshape(1, -1)
    n = r2p.shape[1]
    blk = min(OBS_BLOCK * 8, n)
    spec = pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    w, c = pl.pallas_call(
        partial(_huber_kernel, delta=delta),
        grid=(_cdiv(n, blk),),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, n), r2.dtype),
                   jax.ShapeDtypeStruct((1, n), r2.dtype)],
        interpret=interpret,
    )(r2p)
    return w[0, :O], c[0, :O]


# ----------------------------------------------------------------------------
# fused squared-Sampson scoring
# ----------------------------------------------------------------------------


def _sampson_kernel(E_ref, x1_ref, x2_ref, err_ref):
    E = E_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    eps = 1e-12
    z1 = x1[2] + eps
    z2 = x2[2] + eps
    a0, a1, a2 = x1[0] / z1, x1[1] / z1, jnp.ones_like(z1)
    b0, b1, b2 = x2[0] / z2, x2[1] / z2, jnp.ones_like(z2)
    Ex0 = E[0] * a0 + E[1] * a1 + E[2] * a2
    Ex1 = E[3] * a0 + E[4] * a1 + E[5] * a2
    Ex2 = E[6] * a0 + E[7] * a1 + E[8] * a2
    Et0 = E[0] * b0 + E[3] * b1 + E[6] * b2
    Et1 = E[1] * b0 + E[4] * b1 + E[7] * b2
    C = Ex0 * b0 + Ex1 * b1 + Ex2 * b2
    denom = Ex0 * Ex0 + Ex1 * Ex1 + Et0 * Et0 + Et1 * Et1
    err_ref[0, :] = C * C / jnp.maximum(denom, eps)


@partial(jax.jit, static_argnames=("interpret",))
def sampson_score(E_rows, x1_rows, x2_rows, interpret: bool = False):
    """E (9, M), rays (3, M) x2 -> squared Sampson error (M,)."""
    M = E_rows.shape[1]
    dtype = E_rows.dtype
    blk = min(OBS_BLOCK * 4, max(LANES, M))

    def spec(k):
        return pl.BlockSpec((k, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    err = pl.pallas_call(
        _sampson_kernel,
        grid=(_cdiv(M, blk),),
        in_specs=[spec(9), spec(3), spec(3)],
        out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, M), dtype),
        interpret=interpret,
    )(E_rows, x1_rows, x2_rows)
    return err[0]
