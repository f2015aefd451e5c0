"""Linear solvers for graph-structured normal equations.

TPU-native replacement for the reference's sparse-direct substrate
(CHOLMOD supernodal LLT in glomap/estimators/global_rotation_averaging.cc
:547,604 and colmap's LeastAbsoluteDeviationSolver): TPUs have no sparse
supernodal Cholesky, so we solve the (graph-Laplacian-like) reduced
systems either densely (blocked Cholesky on the MXU — fastest up to a few
thousand nodes) or with preconditioned CG whose matvec is a gather +
segment-sum (HBM-bandwidth bound, scales to city-size graphs and shards
cleanly with psum).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    jnp.linalg.inv lowers to a batched LU custom call (~0.8 ms for 1024
    matrices on v5e, profiled); the adjugate is a handful of VPU fmas.
    Callers guarantee A is invertible (damped SPD blocks)."""
    a = A[..., 0, 0]; b = A[..., 0, 1]; c = A[..., 0, 2]
    d = A[..., 1, 0]; e = A[..., 1, 1]; f = A[..., 1, 2]
    g = A[..., 2, 0]; h = A[..., 2, 1]; i = A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / det
    M = jnp.stack([jnp.stack([c00, c01, c02], axis=-1),
                   jnp.stack([c10, c11, c12], axis=-1),
                   jnp.stack([c20, c21, c22], axis=-1)], axis=-2)
    return M * inv_det[..., None, None]


def build_laplacian_dense(fi: jax.Array, fj: jax.Array, w: jax.Array,
                          num_nodes: int) -> jax.Array:
    """Weighted graph Laplacian (num_nodes, num_nodes) from edge lists.

    Invalid/padded edges must carry w == 0.
    """
    L = jnp.zeros((num_nodes, num_nodes), dtype=w.dtype)
    L = L.at[fi, fj].add(-w)
    L = L.at[fj, fi].add(-w)
    deg = jnp.zeros((num_nodes,), dtype=w.dtype)
    deg = deg.at[fi].add(w)
    deg = deg.at[fj].add(w)
    L = L + jnp.diag(deg)
    return L


def pin_node(L: jax.Array, rhs: jax.Array, fixed: jax.Array):
    """Pin node `fixed` to zero: unit row/col in L, zero rhs (exact gauge
    fix, the reference's fixed_camera_id_ equivalent)."""
    n = L.shape[0]
    onehot = jnp.zeros((n,), dtype=L.dtype).at[fixed].set(1.0)
    keep = 1.0 - onehot
    L = L * keep[:, None] * keep[None, :] + jnp.diag(onehot)
    rhs = rhs * keep[:, None] if rhs.ndim == 2 else rhs * keep
    return L, rhs


def solve_laplacian_dense(fi, fj, w, rhs, num_nodes: int, fixed,
                          damping: float = 1e-10):
    """Solve (L + damping*diag) x = rhs with node `fixed` pinned to 0.

    rhs: (num_nodes, k). Dense Cholesky — MXU-friendly for
    num_nodes <~ 4096.
    """
    L = build_laplacian_dense(fi, fj, w, num_nodes)
    scale = jnp.maximum(jnp.mean(jnp.diag(L)), 1.0)
    L = L + (damping * scale) * jnp.eye(num_nodes, dtype=L.dtype)
    L, rhs = pin_node(L, rhs, fixed)
    c, lower = jax.scipy.linalg.cho_factor(L)
    return jax.scipy.linalg.cho_solve((c, lower), rhs)


def laplacian_matvec(fi, fj, w, deg, x, keep):
    """(L x) for edge-list Laplacian; x: (n, k); `keep` zeroes pinned node."""
    xk = x * keep[:, None]
    gi = xk[fi]
    gj = xk[fj]
    y = deg[:, None] * xk
    y = y.at[fi].add(-w[:, None] * gj)
    y = y.at[fj].add(-w[:, None] * gi)
    # pinned node: identity row
    y = y * keep[:, None] + x * (1.0 - keep)[:, None]
    return y


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def solve_laplacian_cg(fi, fj, w, rhs, num_nodes: int, fixed,
                       max_iters: int = 200, tol: float = 1e-10):
    """Jacobi-preconditioned CG on the pinned Laplacian. rhs: (n, k).

    Matvec = gather + scatter-add: O(E) HBM traffic, no dense matrix —
    the scalable path for city-size frame graphs; shards over edges with
    psum of the (n, k) result.
    """
    deg = jnp.zeros((num_nodes,), dtype=w.dtype)
    deg = deg.at[fi].add(w)
    deg = deg.at[fj].add(w)
    keep = jnp.ones((num_nodes,), dtype=w.dtype).at[fixed].set(0.0)
    b = rhs * keep[:, None]
    minv = keep / jnp.maximum(deg, 1e-12) + (1.0 - keep)

    def mv(x):
        return laplacian_matvec(fi, fj, w, deg, x, keep)

    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0
    z0 = minv[:, None] * r0
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, r, _, _, it = state
        return (it < max_iters) & (jnp.linalg.norm(r) / bnorm > tol)

    def body(state):
        x, r, p, rz, it = state
        Ap = mv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = minv[:, None] * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x


def cg_generic(matvec, b, minv_diag=None, max_iters: int = 100,
               tol: float = 1e-8, precond=None,
               return_info: bool = False):
    """Generic preconditioned CG for SPD operators.

    b and all iterates share one pytree-free array shape. Used by the BA
    Schur-reduced camera system (matrix-free) and other estimators.
    `precond` (callable) takes precedence over the diagonal `minv_diag`.
    With return_info, returns (x, iterations, relative_residual) so
    solvers can surface whether the iteration cap (not the forcing
    tolerance) terminated the solve — the Ceres
    max_linear_solver_iterations observability analog.
    """
    if precond is None:
        if minv_diag is None:
            precond = lambda r: r
        else:
            precond = lambda r: minv_diag * r

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, r, _, _, it = state
        return (it < max_iters) & (jnp.linalg.norm(r) / bnorm > tol)

    def body(state):
        x, r, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, _, _, it = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    if return_info:
        return x, it, jnp.linalg.norm(r) / bnorm
    return x
