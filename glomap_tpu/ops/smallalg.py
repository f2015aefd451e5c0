"""Closed-form / iterative small-matrix algebra for huge batches.

TPU's LAPACK-style batched factorizations (eigh/svd/qr) lower to looping
custom calls that run orders of magnitude below the VPU's ability for
tiny matrices (a 316k-batch 9x9 eigh measured 4.3 s; 3x3 svd can even
overflow scoped vmem). These routines replace them in the RANSAC hot path
with pure elementwise math:

  * sym3x3_eigh   — analytic (Cardano) eigendecomposition of symmetric
                    3x3 batches
  * essential_project — project E onto the essential manifold
                    (sigma = (1, 1, 0)) via sym3x3_eigh of E^T E
  * min_eigvec9   — smallest eigenvector of symmetric 9x9 batches by
                    shifted power iteration (Gershgorin shift), the
                    8-point nullspace solve
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sym3x3_eigh(A: jax.Array):
    """Analytic eigendecomposition of symmetric (..., 3, 3).

    Returns (eigvals ascending (..., 3), eigvecs (..., 3, 3) columns).
    Cardano for the eigenvalues; eigenvectors from cross products of
    (A - lambda I) rows with degeneracy-robust row selection.
    """
    dtype = A.dtype
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 +
          2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    ip = 1.0 / p
    # det(B/p) / 2
    c00, c11, c22 = b00 * ip, b11 * ip, b22 * ip
    c01, c02, c12 = a01 * ip, a02 * ip, a12 * ip
    half_det = 0.5 * (c00 * (c11 * c22 - c12 * c12) -
                      c01 * (c01 * c22 - c12 * c02) +
                      c02 * (c01 * c12 - c11 * c02))
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    two_pi_3 = 2.0943951023931953
    l0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)          # smallest
    l2 = q + 2.0 * p * jnp.cos(phi)                     # largest
    l1 = 3.0 * q - l0 - l2
    evals = jnp.stack([l0, l1, l2], axis=-1)

    def eigvec(lam):
        # rows of (A - lam I)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01_ = jnp.cross(r0, r1)
        c12_ = jnp.cross(r1, r2)
        c20_ = jnp.cross(r2, r0)
        n01 = jnp.sum(c01_ * c01_, axis=-1, keepdims=True)
        n12 = jnp.sum(c12_ * c12_, axis=-1, keepdims=True)
        n20 = jnp.sum(c20_ * c20_, axis=-1, keepdims=True)
        v = jnp.where(n01 >= jnp.maximum(n12, n20), c01_,
                      jnp.where(n12 >= n20, c12_, c20_))
        n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                 1e-30))
        return v / n

    v0 = eigvec(l0)
    v2 = eigvec(l2)
    # enforce orthogonality: v1 = v2 x v0
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, -1, keepdims=True),
                                   1e-30))
    # re-orthogonalize v0 against the others for near-degenerate spectra
    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return evals.astype(dtype), vecs.astype(dtype)


def _unit(v):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True),
                                    1e-30))


def _tangent_pair(n):
    """Deterministic orthonormal basis of the plane orthogonal to unit n."""
    a = jnp.where(jnp.abs(n[..., :1]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], n.dtype))
    t1 = _unit(jnp.cross(n, a))
    t2 = jnp.cross(n, t1)
    return t1, t2


def essential_basis(E: jax.Array):
    """(U, V) for a (near-)essential (..., 3, 3): sigma ~ (s, s, 0).

    E^T E of an essential matrix has a REPEATED large eigenvalue, so
    individual eigenvectors of the large pair are ill-defined — but any
    orthonormal basis of that plane is a valid pair of right singular
    vectors. We therefore take the UNIQUE null direction v3 (smallest
    eigenvector, well-separated) and a deterministic tangent basis
    (v1, v2); u_i = unit(E v_i); u3 = u1 x u2. Both U and V are proper
    rotations by construction.
    """
    EtE = jnp.swapaxes(E, -1, -2) @ E
    _, V3 = sym3x3_eigh(EtE)
    v3 = V3[..., :, 0]  # null direction (unique smallest eigenvalue)
    v1, v2 = _tangent_pair(v3)
    u1 = _unit(jnp.einsum("...ij,...j->...i", E, v1))
    u2 = jnp.einsum("...ij,...j->...i", E, v2)
    u2 = _unit(u2 - jnp.sum(u2 * u1, -1, keepdims=True) * u1)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    V = jnp.stack([v1, v2, v3], axis=-1)
    return U, V


def essential_project(E: jax.Array) -> jax.Array:
    """Project (..., 3, 3) onto the essential manifold (sigma = (1,1,0)).

    Exact for near-essential inputs (the RANSAC nullspace candidates);
    for generic E it returns a valid essential matrix close to the
    Frobenius-optimal projection. No LAPACK calls.
    """
    U, V = essential_basis(E)
    u1, u2 = U[..., :, 0], U[..., :, 1]
    v1, v2 = V[..., :, 0], V[..., :, 1]
    return (u1[..., :, None] * v1[..., None, :] +
            u2[..., :, None] * v2[..., None, :])


def cholesky_unrolled(A: jax.Array, n: int, eps: float = 1e-12):
    """Batched Cholesky of (..., n, n) SPD matrices, fully unrolled into
    elementwise ops (no LAPACK custom call). Returns L as an n x n list
    of (...,) arrays (lower triangle)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, eps))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            v = A[..., i, j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv_d
    return L


def cholesky_solve_unrolled(L, b_components, n: int):
    """Solve L L^T x = b with the unrolled factor; b as list of (...,)."""
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        v = b_components[i]
        for k in range(i):
            v = v - L[i][k] * y[k]
        y[i] = v / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        v = y[i]
        for k in range(i + 1, n):
            v = v - L[k][i] * x[k]
        x[i] = v / L[i][i]
    return x


# ---------------------------------------------------------------------------
# COMPONENT-FORM (lane-major) variants for the RANSAC hot path.
#
# The (..., n, n) packed variants above slice per-matrix scalars out of
# the minor dims: on TPU a (P, H, 1, 1) scalar tensor is tiled T(1,128)
# — every scalar padded to a full lane row, ~1/1000 VPU utilization.
# One such fusion was 84% of the RANSAC chunk's device time
# (scripts/profile_relpose.py). These variants keep every per-matrix
# scalar as a DENSE batch-shaped array (component-indexed layout
# (n, n, B) with the batch on the minor axis), so the unrolled algebra
# is plain full-lane elementwise math.
# ---------------------------------------------------------------------------


def sym3x3_eigvec0_c(a00, a01, a02, a11, a12, a22):
    """Unit eigenvector of the SMALLEST eigenvalue of symmetric 3x3
    batches given as six dense component arrays. Returns (vx, vy, vz)
    plus the eigenvalue. Cardano + degeneracy-robust row-cross pick —
    the component-form core of sym3x3_eigh for callers that only need
    the null direction."""
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 +
          2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    ip = 1.0 / p
    c00, c11, c22 = b00 * ip, b11 * ip, b22 * ip
    c01, c02, c12 = a01 * ip, a02 * ip, a12 * ip
    half_det = 0.5 * (c00 * (c11 * c22 - c12 * c12) -
                      c01 * (c01 * c22 - c12 * c02) +
                      c02 * (c01 * c12 - c11 * c02))
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    two_pi_3 = 2.0943951023931953
    lam = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest

    # rows of (A - lam I); crosses computed componentwise
    r0 = (a00 - lam, a01, a02)
    r1 = (a01, a11 - lam, a12)
    r2 = (a02, a12, a22 - lam)

    def cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    c01_ = cross(r0, r1)
    c12_ = cross(r1, r2)
    c20_ = cross(r2, r0)
    n01 = c01_[0] ** 2 + c01_[1] ** 2 + c01_[2] ** 2
    n12 = c12_[0] ** 2 + c12_[1] ** 2 + c12_[2] ** 2
    n20 = c20_[0] ** 2 + c20_[1] ** 2 + c20_[2] ** 2
    pick01 = n01 >= jnp.maximum(n12, n20)
    pick12 = n12 >= n20
    v = tuple(jnp.where(pick01, c01_[k],
                        jnp.where(pick12, c12_[k], c20_[k]))
              for k in range(3))
    inv = 1.0 / jnp.sqrt(jnp.maximum(v[0] ** 2 + v[1] ** 2 + v[2] ** 2,
                                     1e-30))
    return (v[0] * inv, v[1] * inv, v[2] * inv), lam


def essential_project_c(Ec):
    """Project 3x3 batches onto the essential manifold, component form.

    Ec: nested [i][j] dense component arrays. Returns the projected
    components in the same layout (sigma = (1, 1, 0) exact for
    near-essential inputs, same math as essential_project)."""
    # EtE components (symmetric)
    def col(j):
        return (Ec[0][j], Ec[1][j], Ec[2][j])

    def dot3(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    g00 = dot3(col(0), col(0))
    g01 = dot3(col(0), col(1))
    g02 = dot3(col(0), col(2))
    g11 = dot3(col(1), col(1))
    g12 = dot3(col(1), col(2))
    g22 = dot3(col(2), col(2))
    v3, _ = sym3x3_eigvec0_c(g00, g01, g02, g11, g12, g22)

    # deterministic tangent basis of the plane orthogonal to v3
    use_x = jnp.abs(v3[0]) < 0.9
    ax = jnp.where(use_x, 1.0, 0.0)
    ay = jnp.where(use_x, 0.0, 1.0)
    # t1 = unit(v3 x a), t2 = v3 x t1  (a has az = 0)
    t1 = (-v3[2] * ay, v3[2] * ax, v3[0] * ay - v3[1] * ax)
    inv = 1.0 / jnp.sqrt(jnp.maximum(
        t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2, 1e-30))
    t1 = (t1[0] * inv, t1[1] * inv, t1[2] * inv)
    t2 = (v3[1] * t1[2] - v3[2] * t1[1],
          v3[2] * t1[0] - v3[0] * t1[2],
          v3[0] * t1[1] - v3[1] * t1[0])

    def matvec(v):
        return tuple(Ec[i][0] * v[0] + Ec[i][1] * v[1] + Ec[i][2] * v[2]
                     for i in range(3))

    u1 = matvec(t1)
    inv = 1.0 / jnp.sqrt(jnp.maximum(
        u1[0] ** 2 + u1[1] ** 2 + u1[2] ** 2, 1e-30))
    u1 = (u1[0] * inv, u1[1] * inv, u1[2] * inv)
    u2 = matvec(t2)
    d = u2[0] * u1[0] + u2[1] * u1[1] + u2[2] * u1[2]
    u2 = (u2[0] - d * u1[0], u2[1] - d * u1[1], u2[2] - d * u1[2])
    inv = 1.0 / jnp.sqrt(jnp.maximum(
        u2[0] ** 2 + u2[1] ** 2 + u2[2] ** 2, 1e-30))
    u2 = (u2[0] * inv, u2[1] * inv, u2[2] * inv)

    # E' = u1 t1^T + u2 t2^T
    return [[u1[i] * t1[j] + u2[i] * t2[j] for j in range(3)]
            for i in range(3)]


def min_eigvec9_c(Ac, num_iters: int = 8):
    """Smallest eigenvector of symmetric 9x9 batches, component form.

    Ac: indexable [i][j] -> dense batch-shaped component array (e.g. a
    (9, 9, B) jnp array or nested lists). Returns a list of 9 dense
    components. Same inverse-iteration algorithm as min_eigvec9 with
    every scalar a full-lane array."""
    tr = sum(Ac[i][i] for i in range(9))
    eps = 1e-8 * jnp.maximum(tr, 1e-30)

    n = 9
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = Ac[j][j] + eps
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-12))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            v = Ac[i][j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv_d

    comps = [1.0 + 0.1 * Ac[i][i] / jnp.maximum(tr, 1e-30)
             for i in range(n)]
    for _ in range(num_iters):
        comps = cholesky_solve_unrolled(L, comps, n)
        nrm = comps[0] * comps[0]
        for i in range(1, n):
            nrm = nrm + comps[i] * comps[i]
        inv = 1.0 / jnp.sqrt(jnp.maximum(nrm, 1e-30))
        comps = [c * inv for c in comps]
    return comps


def min_eigvec9(AtA: jax.Array, num_iters: int = 8) -> jax.Array:
    """Smallest eigenvector of symmetric (..., 9, 9) batches.

    Inverse iteration with a single unrolled batched Cholesky of
    AtA + eps*tr*I: convergence ratio (lmin + eps)/(l2 + eps) — a handful
    of triangular solves even for near-degenerate spectra. Entirely
    elementwise; no LAPACK custom calls (batched eigh measured ~4 s for
    316k 9x9 on TPU vs microseconds here).
    """
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    eps = 1e-8 * jnp.maximum(tr, 1e-30)
    A = AtA + eps[..., None, None] * jnp.eye(9, dtype=AtA.dtype)
    L = cholesky_unrolled(A, 9)

    x = jnp.ones(AtA.shape[:-2] + (9,), AtA.dtype)
    x = x + 0.1 * jnp.diagonal(AtA, axis1=-2, axis2=-1) / \
        jnp.maximum(tr[..., None], 1e-30)
    comps = [x[..., i] for i in range(9)]

    for _ in range(num_iters):
        comps = cholesky_solve_unrolled(L, comps, 9)
        nrm = comps[0] * comps[0]
        for i in range(1, 9):
            nrm = nrm + comps[i] * comps[i]
        inv = 1.0 / jnp.sqrt(jnp.maximum(nrm, 1e-30))
        comps = [c * inv for c in comps]
    return jnp.stack(comps, axis=-1)
